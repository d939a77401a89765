"""Dump `.explain("formatted")` for every declared query (or the named
ones) to plans/<tag>/<query>.txt — the plan-shape evidence the optimization
rounds commit alongside before/after bench numbers.

Usage:
    python tools/dump_plans.py <out_dir> [sf_dir] [query ...]

Plans are built lazily (no execution), so this is driver-only work and does
not disturb a concurrent bench. With AQE on the dump is the INITIAL plan
(`AdaptiveSparkPlan isFinalPlan=false`); Exchange counts, join strategy,
PushedFilters/ReadSchema and Python-eval nodes are all visible there.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = ilu.module_from_spec(spec)
    spec.loader.exec_module(entry)
    from reddit_twitter_big_data_pipeline_spark.session import get_spark

    spark = get_spark("dump-plans", cpus=4)
    qs = entry.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR building plan: {ex}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
