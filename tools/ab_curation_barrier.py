"""Interleaved A/B for the r13 gated-stage checkpoint barrier applied to
curate_corpus_v2 / curate_increment / curate_increment_v2 (the fix v3
landed in r10, extended to the rest of the family).

Arm `barrier`  : checkpoint_gated=True (new default) — lazy localCheckpoint
                 of the gated survivors truncates the logical plan.
Arm `inline`   : checkpoint_gated=False — the pre-r13 shape (fully-lazy
                 plan for v2/increment; plan-keyed persist for
                 increment_v2).

Both arms produce identical rows (same expressions; the barrier only cuts
Catalyst's re-analysis of the substituted gate trees and the per-reference
re-evaluation the pushed-down filters pay). Interleaved min-of-N in ONE
session per the BASELINE.md discipline — sequential blocks do not
adjudicate on this box.

Usage: python tools/ab_curation_barrier.py [sf_dir] [reps] [query ...]
Prints one JSON line with min/median per arm per query and the ratios.
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
from reddit_twitter_big_data_pipeline_spark.plans import training  # noqa: E402

QUERIES = [
    "train_curation_v2",
    "train_curation_increment",
    "train_curation_increment_v2",
]

_PATCH = {
    "train_curation_v2": "curate_corpus_v2",
    "train_curation_increment": "curate_increment",
    "train_curation_increment_v2": "curate_increment_v2",
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    names = sys.argv[3:] or QUERIES
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    def run(name: str, barrier: bool) -> float:
        fn_name = _PATCH[name]
        orig = getattr(training, fn_name)

        def patched(*a, **k):
            k["checkpoint_gated"] = barrier
            return orig(*a, **k)

        setattr(training, fn_name, patched)
        try:
            spark.sparkContext.setJobDescription(
                f"ab_barrier {name} {'barrier' if barrier else 'inline'}"
            )
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)
        finally:
            setattr(training, fn_name, orig)
            spark.sparkContext.setJobDescription(None)

    # warm pass, untimed (page cache, JIT)
    for n in names:
        run(n, True)

    times: dict[str, dict[str, list[float]]] = {
        n: {"barrier": [], "inline": []} for n in names
    }
    for _ in range(reps):
        for n in names:
            times[n]["barrier"].append(run(n, True))
            times[n]["inline"].append(run(n, False))
    out = {}
    for n in names:
        b, i = times[n]["barrier"], times[n]["inline"]
        out[n] = {
            "barrier_min": min(b),
            "barrier_median": statistics.median(b),
            "inline_min": min(i),
            "inline_median": statistics.median(i),
            "ratio_min": round(min(b) / max(min(i), 1e-9), 3),
            "barrier": b,
            "inline": i,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
