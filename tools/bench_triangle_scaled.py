"""Scaled bench for triangle_count's adjacency-intersection path (the
session-3 default): the sf0.1 co-supply graph (453,588 edges / 1,000
nodes, 124,470,598 triangles) is replicated 1x/4x/16x with disjoint
node-id offsets — each replica is a disjoint, structurally identical
component, so edges, wedges, and triangles all scale exactly with R
while the orientation's per-node out-degree bound stays FIXED (~1,000,
the single-replica bound; disjoint components don't interact). If the
adjacency path is linear in the data (the claim — one m-row join, per-row
intersect cost fixed by the replica's degree profile), t(16x)/t(1x) ≈ 16
or below; superlinear growth would flag a plan problem (e.g. the
collect_list agg degenerating). A single wedge-join reference cell runs
at 1x for context (the fallback arm's cost at the same shape).

Reps are INTERLEAVED across scales (rep 0: 1x,4x,16x; rep 1: ...) with
min-per-cell, the bench_graph_scaled.py discipline, so ambient drift
cannot masquerade as a scaling trend. Triangle counts are asserted to be
exactly R x the 1x count every rep.

Usage: python tools/bench_triangle_scaled.py [sf_dir] [reps]
Prints one JSON line: {edges per scale, adj min per scale, ratio_16x_1x,
wedge_1x_reference}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from reddit_twitter_big_data_pipeline_spark import schemas, session  # noqa: E402
from reddit_twitter_big_data_pipeline_spark.operators import model  # noqa: E402

SCALES = (1, 4, 16)
OFF = 10_000_000  # node-id offset between replicas


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    li = schemas.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    base = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_suppkey") < F.col("y.l_suppkey"))
        .select(F.col("x.l_suppkey").alias("a"), F.col("y.l_suppkey").alias("b"))
        .distinct()
    )

    graphs: dict[int, object] = {}
    edges: dict[int, int] = {}
    for r in SCALES:
        g = base.crossJoin(
            spark.range(r).select((F.col("id") * OFF).alias("__off"))
        ).select(
            (F.col("a") + F.col("__off")).alias("a"),
            (F.col("b") + F.col("__off")).alias("b"),
        )
        g = g.persist()
        edges[r] = g.count()  # materialize so replication cost is excluded
        graphs[r] = g

    n1 = None
    times: dict[int, list[float]] = {r: [] for r in SCALES}
    wedge_ref: list[float] = []
    for rep in range(reps):
        for r in SCALES:
            t0 = time.time()
            n = model.triangle_count(graphs[r]).collect()[0][0]
            times[r].append(time.time() - t0)
            if r == 1:
                n1 = n
            assert n == r * n1, (r, n, n1)
            print(
                f"rep{rep} {r}x: {times[r][-1]:.2f}s n={n}",
                file=sys.stderr,
                flush=True,
            )
        t0 = time.time()
        nw = model.triangle_count(graphs[1], adj_threshold=0).collect()[0][0]
        wedge_ref.append(time.time() - t0)
        assert nw == n1
        print(f"rep{rep} wedge-1x: {wedge_ref[-1]:.2f}s", file=sys.stderr, flush=True)

    out = {
        "edges": edges,
        "adj_min": {r: round(min(v), 3) for r, v in times.items()},
        "ratio_16x_1x": round(min(times[16]) / min(times[1]), 3),
        "wedge_1x_reference": round(min(wedge_ref), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
