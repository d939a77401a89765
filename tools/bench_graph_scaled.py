"""Scaled-graph bench for the iterative graph operators (VERDICT r7 item 2
/ ADVICE r7): `x_hits` and `x_ppr` sit at ~10 s each in the sf0.1 headline,
and the repo's claim is that this is FIXED LOCAL-MODE JOB OVERHEAD (12-16
sequential scalar-collect jobs whose per-round data is ≤16k (id,double)
rows), not data cost — i.e. the plans amortize to noise at real scale.
That claim was asserted but unmeasured; this script measures it.

Method (the `_bench_incremental_split` salted-replica pattern,
bench.py:246): the x_hits/x_ppr fulfillment graph (lineitem⋈orders,
DISTINCT edges) is replicated 1x/4x/16x with disjoint node-id offsets —
each replica is a structurally identical component, so edge count scales
exactly with R while round count and collect count stay FIXED. PPR seeds
are planted per replica (supplier nodes 1-50 + offset) so teleport mass is
distributed analogously at every scale. Reps are INTERLEAVED across scales
(rep 0: 1x,4x,16x; rep 1: 1x,4x,16x; ...) and min-per-cell is reported, so
ambient drift on this box cannot masquerade as a scaling trend.

If the fixed-overhead story is true, t(16x)/t(1x) << 16 (the per-round
joins/aggs on a 16x graph add work, but the dominant cost — Spark job
scheduling latency x #jobs — is scale-invariant). If it is false, the
ratio approaches 16 and the plans need work.

Recorded result: see the BASELINE.md r8 row.

Usage: python tools/bench_graph_scaled.py [sf_dir] [reps] [n_iter]
Prints one JSON line: per-arm {scale: min_sec}, edge counts, and the
16x/1x ratios.
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
OFF = 10_000_000  # node-id offset between replicas (dst ids are +1e6)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    li = schemas.load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = schemas.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )

    edges: dict[int, object] = {}
    seeds: dict[int, object] = {}
    n_edges: dict[int, int] = {}
    for r in SCALES:
        rep = spark.range(r).select(F.col("id").alias("__r"))
        e = (
            base.crossJoin(rep)
            .select(
                (F.col("src") + F.col("__r") * OFF).alias("src"),
                (F.col("dst") + F.col("__r") * OFF).alias("dst"),
            )
            # materialize each scaled edge set to parquet so every timed
            # arm starts from an identical cold scan (not a cached union)
        )
        path = f"/tmp/graph_scaled_{r}x.parquet"
        e.write.mode("overwrite").parquet(path)
        edges[r] = spark.read.parquet(path)
        n_edges[r] = edges[r].count()
        seeds[r] = (
            spark.range(1, 51)
            .crossJoin(rep)
            .select((F.col("id") + F.col("__r") * OFF).alias("node"))
        )

    def run_hits(r: int) -> int:
        return model.hits(edges[r], n_iter=n_iter).count()

    def run_ppr(r: int) -> int:
        return model.personalized_pagerank(edges[r], seeds[r], n_iter=n_iter).count()

    arms = {"hits": run_hits, "ppr": run_ppr}
    # warm once at 1x (JIT, shuffle service, page cache)
    for name, fn in arms.items():
        t0 = time.time()
        n = fn(1)
        print(f"warm {name} 1x: {time.time() - t0:.2f}s rows={n}", file=sys.stderr, flush=True)

    times: dict[str, dict[int, float]] = {a: {r: -1.0 for r in SCALES} for a in arms}
    for rep_i in range(reps):
        for r in SCALES:  # interleaved: every rep visits every scale
            for name, fn in arms.items():
                t0 = time.time()
                fn(r)
                dt = round(time.time() - t0, 3)
                cur = times[name][r]
                times[name][r] = dt if cur < 0 else min(cur, dt)
                print(f"rep{rep_i} {name} {r}x: {dt:.2f}s", file=sys.stderr, flush=True)

    out = {
        "n_iter": n_iter,
        "edges": n_edges,
        "hits_sec": times["hits"],
        "ppr_sec": times["ppr"],
        "hits_ratio_16x": round(times["hits"][16] / times["hits"][1], 3),
        "ppr_ratio_16x": round(times["ppr"][16] / times["ppr"][1], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
