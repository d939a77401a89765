"""Adjudicate ambient-flagged bench movers (r10 VERDICT watch items):
time the named queries INTERLEAVED (round-robin, N rounds, one session)
and print min/median per query next to their recorded r9/r10 bench
values. The code of these queries did not change r9→r10, so a min that
lands back in the r9 band confirms the r10 number was ambient load, not
a regression; a min that reproduces the r10 number is a real slowdown.

Usage: python tools/adjudicate_movers.py [sf_dir] [reps] [query ...]
Defaults to the r10 watch list. Prints one JSON line.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from reddit_twitter_big_data_pipeline_spark import session  # noqa: E402

WATCH = ["text_bpe_merge_select", "sim_self_knn", "dedup_simhash_pairs"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    names = sys.argv[3:] or WATCH
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    recorded = {}
    for tag in ("r09", "r10"):
        try:
            with open(os.path.join(REPO, f"BENCH_{tag}_local.json")) as f:
                recorded[tag] = json.load(f).get("queries", {})
        except OSError:
            recorded[tag] = {}

    for name in names:  # warm pass (page cache, JIT) — not timed
        qs[name](spark, sf_dir).count()
    times: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            times[name].append(time.time() - t0)
            print(
                f"rep{rep} {name}: {times[name][-1]:.2f}s", file=sys.stderr, flush=True
            )
    out = {}
    for name in names:
        ts = times[name]
        out[name] = {
            "min": round(min(ts), 3),
            "median": round(statistics.median(ts), 3),
            "r09": recorded["r09"].get(name),
            "r10": recorded["r10"].get(name),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
