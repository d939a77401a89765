"""Pre-commit preflight (VERDICT r6 item 6) — the round-6 failure mode was a
final commit that was never run against the suite. Run this before every
commit that touches ``reddit_twitter_big_data_pipeline_spark/`` or
``__spark_entry__.py``:

    python tools/preflight.py                 # changed files since HEAD
    python tools/preflight.py --full          # whole suite + full sweep

Default mode maps each changed source module to its test files (by grep for
the module name under tests/) and runs ``pytest -x -q`` on that subset, then
``tools/audit_plans.py`` and a sf0.001 ``tools/check_correctness.py`` sweep
over any queries whose names appear in the diff. ``--full`` runs the entire
suite and the full sf0.01 sweep (what the judge runs).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sh(*args: str) -> str:
    return subprocess.run(args, cwd=REPO, capture_output=True, text=True).stdout


def changed_files() -> list[str]:
    out = sh("git", "status", "--porcelain")
    files = []
    for line in out.splitlines():
        f = line[3:].split(" -> ")[-1].strip()
        if f.endswith(".py"):
            files.append(f)
    return files


def tests_for(files: list[str]) -> list[str]:
    """Test files that import/reference any changed module (by stem grep)."""
    stems = set()
    for f in files:
        if f.startswith("tests/"):
            stems.add(f)  # changed test file: run it directly
            continue
        stems.add(os.path.splitext(os.path.basename(f))[0])
    picked = set(s for s in stems if s.startswith("tests/"))
    mods = [s for s in stems if not s.startswith("tests/")]
    if mods:
        tdir = os.path.join(REPO, "tests")
        for tf in sorted(os.listdir(tdir)):
            if not tf.endswith(".py"):
                continue
            src = open(os.path.join(tdir, tf)).read()
            if any(re.search(rf"\b{re.escape(m)}\b", src) for m in mods):
                picked.add(f"tests/{tf}")
    return sorted(picked)


def changed_queries(files: list[str]) -> list[str]:
    """queries() keys named anywhere in the working-tree diff."""
    import __spark_entry__ as entry

    diff = sh("git", "diff", "HEAD") + " ".join(files)
    return sorted(q for q in entry.queries() if q in diff)


def main() -> int:
    full = "--full" in sys.argv
    files = changed_files()
    if not files and not full:
        print("preflight: no changed .py files — nothing to check")
        return 0
    failures = []

    if full:
        pytest_args = ["tests/"]
    else:
        pytest_args = tests_for(files)
    if pytest_args:
        print(f"preflight: pytest {' '.join(pytest_args)}", flush=True)
        rc = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q", *pytest_args], cwd=REPO
        ).returncode
        if rc:
            failures.append(f"pytest rc={rc}")

    qs = [] if full else changed_queries(files)
    sf = os.path.join("/root/testdata", "sf0.01" if full else "sf0.001")
    if full or qs:
        args = [sys.executable, "tools/check_correctness.py", sf, *qs]
        print(f"preflight: {' '.join(args[1:])}", flush=True)
        rc = subprocess.run(args, cwd=REPO).returncode
        if rc:
            failures.append(f"check_correctness rc={rc}")
        rc = subprocess.run(
            [sys.executable, "tools/audit_plans.py", "/root/testdata/sf0.001", *qs],
            cwd=REPO,
        ).returncode
        if rc:
            failures.append(f"audit_plans rc={rc}")

    if failures:
        print("preflight FAILED: " + "; ".join(failures))
        return 1
    print("preflight OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
