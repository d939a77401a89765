"""Interleaved A/B for `clustering_coefficient`'s r11 adjacency-
intersection form vs the wedge-join form, on the sf0.1 thinned co-supply
graph (the `x_clustering_coeff` input: l_quantity > 47 edges).

Arm `adj`  : per-source sorted out-neighbor arrays over the degree-
             oriented DAG, per-edge apex intersection, corner
             contributions exploded from the base edge — no wedge set.
Arm `wedge`: the r6 form (o ⋈ o on t=s, close against o, explode the
             three corners of each closed triangle).

Both arms share `_degree_oriented`; full (node, degree, triangles, lcc)
row sets are asserted identical on the warm pass.

Usage: python tools/ab_lcc.py [sf_dir] [reps]
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
    # the x_clustering_coeff thinned co-supply graph (same construction as
    # __spark_entry__._thinned_cosupply, via the shared nanos-safe loader)
    li = (
        schemas.load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 47)
        .select("l_orderkey", "l_suppkey")
    )
    return (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_suppkey") < F.col("y.l_suppkey"))
        .select(F.col("x.l_suppkey").alias("src"), F.col("y.l_suppkey").alias("dst"))
        .distinct()
    )


def run_arm(pairs, adj_threshold, collect_rows=False):
    # adj_threshold=0 forces the wedge join; otherwise wedge_factor=0
    # forces the adjacency intersection (bypassing the density gate so
    # the A/B always compares the two physical forms)
    t = time.time()
    out = model.clustering_coefficient(
        pairs, a="src", b="dst", adj_threshold=adj_threshold,
        wedge_factor=0 if adj_threshold else 32.0,
    )
    rows = out.collect() if collect_rows else out.count()
    return time.time() - t, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    pairs = _pairs(spark, sf_dir)
    # warm both arms + assert identical row sets once
    _, ra = run_arm(pairs, adj_threshold=1 << 15, collect_rows=True)
    _, rw = run_arm(pairs, adj_threshold=0, collect_rows=True)
    key = lambda r: (r.node, r.degree, r.triangles, r.lcc)  # noqa: E731
    assert sorted(map(key, ra)) == sorted(map(key, rw)), "arms disagree"
    times = {"adj": [], "wedge": []}
    for rep in range(reps):
        ta, na = run_arm(pairs, adj_threshold=1 << 15)
        tw, nw = run_arm(pairs, adj_threshold=0)
        assert na == nw, (na, nw)
        times["adj"].append(ta)
        times["wedge"].append(tw)
        print(f"rep{rep} adj={ta:.2f}s wedge={tw:.2f}s rows={na}", file=sys.stderr)
    out = {
        arm: {"min": round(min(v), 3), "median": round(statistics.median(v), 3)}
        for arm, v in times.items()
    }
    out["ratio_min"] = round(out["adj"]["min"] / out["wedge"]["min"], 3)
    out["rows"] = len(ra)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
