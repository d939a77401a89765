"""Interleaved A/B for `triangle_count`'s adjacency-intersection form vs
the wedge-join form, on the sf0.1 supplier co-supply graph (the
`x_triangle_count` input: 453,588 edges over 1,000 nodes — 91% of
complete, 124,470,598 triangles).

Arm `adj`  : per-source sorted out-neighbor arrays over the degree-
             oriented DAG, one m-row join, Σ size(array_intersect) —
             the same exact count, no 3.3e8-row wedge shuffle.
Arm `wedge`: the r6 wedge-join form (o ⋈ o on t=s, then close against o).

Both arms share `_degree_oriented`; counts are asserted equal every rep.

Usage: python tools/ab_triangle.py [sf_dir] [reps]
Prints one JSON line with min/median per arm and the ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from reddit_twitter_big_data_pipeline_spark import schemas, session  # noqa: E402
from reddit_twitter_big_data_pipeline_spark.operators import model  # noqa: E402


def _pairs(spark, sf_dir):
    # the x_triangle_count co-supply graph (same construction as
    # tools/bench_triangle_scaled.py, via the shared nanos-safe loader)
    li = schemas.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    return (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_suppkey") < F.col("y.l_suppkey"))
        .select(F.col("x.l_suppkey").alias("a"), F.col("y.l_suppkey").alias("b"))
        .distinct()
    )


def run_arm(pairs, adj_threshold):
    t = time.time()
    n = model.triangle_count(pairs, adj_threshold=adj_threshold).collect()[0][0]
    return time.time() - t, n


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    pairs = _pairs(spark, sf_dir)
    times = {"adj": [], "wedge": []}
    for rep in range(reps):
        ta, na = run_arm(pairs, adj_threshold=1 << 15)  # bound ~952 << 32768
        tw, nw = run_arm(pairs, adj_threshold=0)  # force the wedge join
        assert na == nw, (na, nw)
        times["adj"].append(ta)
        times["wedge"].append(tw)
        print(f"rep{rep} adj={ta:.2f}s wedge={tw:.2f}s n={na}", file=sys.stderr)
    out = {
        arm: {"min": round(min(v), 3), "median": round(statistics.median(v), 3)}
        for arm, v in times.items()
    }
    out["ratio_min"] = round(out["adj"]["min"] / out["wedge"]["min"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
