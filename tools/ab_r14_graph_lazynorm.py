"""Interleaved A/B for the r14 graph-loop reshape (VERDICT r13 item 5):
replace the per-half-step cache + 1-row scalar COLLECT in `hits` /
`personalized_pagerank` with a lazy-localCheckpoint barrier plus an
IN-PLAN broadcast 1-row norm (crossJoin of the checkpointed raw frame
with its own aggregate). The r12 rejection of the lazy-norm form (plan
doubling, 2^rounds Catalyst growth) does not apply here: the barrier
truncates the logical plan to a LogicalRDD at every half-step, so the
crossJoin's two references both point at the checkpointed scan and the
per-round plan is constant-size.

Scores must be BIT-IDENTICAL between arms (the oracle unrolls the same
float-op order): the aggregates keep their exact shapes; the only change
is whether the norm travels as a collected Python float literal or as
the same double in a broadcast 1-row frame. The tool asserts exact
equality of collected outputs before timing.

Usage: python tools/ab_r14_graph_lazynorm.py [sf_dir] [reps] [op ...]
       op in {hits, ppr} (default both)
Prints one JSON line per op with min/median per arm, ratio, job counts.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from reddit_twitter_big_data_pipeline_spark import schemas, session  # noqa: E402
from reddit_twitter_big_data_pipeline_spark.operators import model  # noqa: E402


def lazynorm_hits(edges: DataFrame, n_iter: int = 6) -> DataFrame:
    """model.hits with zero in-loop collects: every half-step's raw
    aggregate gets a lazy localCheckpoint (constant-size plan), and its
    L1 norm rides back in-plan as a broadcast 1-row crossJoin."""
    e = (
        edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if nodes.count() == 0:
        return nodes.withColumn("hub", F.lit(0.0)).withColumn(
            "authority", F.lit(0.0)
        )
    hub = nodes.withColumn("hub", F.lit(1.0))
    auth = None
    for _ in range(n_iter):
        raw_a = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("v"))
        ).localCheckpoint(eager=False)
        sa = F.broadcast(raw_a.agg(F.sum("v").alias("__s")))
        auth = raw_a.crossJoin(sa).select(
            F.col("dst").alias("node"), (F.col("v") / F.col("__s")).alias("authority")
        )
        raw_h = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("authority").alias("v"))
        ).localCheckpoint(eager=False)
        sh = F.broadcast(raw_h.agg(F.sum("v").alias("__s")))
        hub = raw_h.crossJoin(sh).select(
            F.col("src").alias("node"), (F.col("v") / F.col("__s")).alias("hub")
        )
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("authority"), F.lit(0.0)).alias("authority"),
        )
    )


def lazynorm_ppr(
    edges: DataFrame,
    sources: DataFrame,
    damping: float = 0.85,
    n_iter: int = 8,
) -> DataFrame:
    """personalized_pagerank with zero in-loop collects: per round the
    rank frame gets a lazy localCheckpoint and the dangling mass rides
    in-plan as a broadcast 1-row crossJoin (anti-join sum over the
    checkpointed ranks)."""
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    s = sources.select("node").distinct().join(nodes, "node").localCheckpoint(
        eager=False
    )
    ns = s.count()
    if ns == 0 or nodes.count() == 0:
        return nodes.filter(F.lit(False)).withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(out_deg, "src").localCheckpoint(eager=False)
    p = (
        nodes.join(s.withColumn("__s", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.col("__s").isNotNull(), F.lit(1.0 / ns))
            .otherwise(F.lit(0.0))
            .alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    ranks = p.select("node", F.col("p").alias("rank")).localCheckpoint(eager=False)
    outs = ed.select("src").distinct().localCheckpoint(eager=False)
    for _ in range(n_iter):
        dang = F.broadcast(
            ranks.join(outs, ranks["node"] == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        sums = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            p.crossJoin(dang)
            .join(sums, F.col("node") == sums["dst"], "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("p")
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("__dm") * F.col("p"))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def _edges(spark, sf_dir):
    li = schemas.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = schemas.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ops = sys.argv[3:] or ["hits", "ppr"]
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    edges = _edges(spark, sf_dir)
    seeds = spark.range(1, 51).select(F.col("id").alias("node"))

    def njobs() -> int:
        st = spark.sparkContext.statusTracker()
        return len(st.getJobIdsForGroup(None) or [])

    arms = {}
    if "hits" in ops:
        arms["hits"] = {
            "old": lambda: model.hits(edges, n_iter=6),
            "new": lambda: lazynorm_hits(edges, n_iter=6),
        }
    if "ppr" in ops:
        arms["ppr"] = {
            "old": lambda: model.personalized_pagerank(edges, seeds, n_iter=8),
            "new": lambda: lazynorm_ppr(edges, seeds, n_iter=8),
        }

    for op, variants in arms.items():
        # bit-identity gate before timing
        old_rows = sorted(map(tuple, variants["old"]().collect()))
        new_rows = sorted(map(tuple, variants["new"]().collect()))
        assert old_rows == new_rows, f"{op}: outputs differ"
        times = {"old": [], "new": []}
        jobs = {"old": [], "new": []}
        for _ in range(reps):
            for name in ("new", "old"):
                spark.sparkContext.setJobDescription(f"ab_lazynorm {op} {name}")
                j0 = njobs()
                t0 = time.time()
                variants[name]().write.format("noop").mode("overwrite").save()
                times[name].append(round(time.time() - t0, 3))
                jobs[name].append(njobs() - j0)
                spark.sparkContext.setJobDescription(None)
        out = {
            "op": op,
            "rows": len(old_rows),
            **{
                f"{n}_{k}": v
                for n in ("old", "new")
                for k, v in (
                    ("min", min(times[n])),
                    ("median", round(statistics.median(times[n]), 3)),
                    ("jobs", jobs[n][0]),
                )
            },
            "ratio_min": round(min(times["new"]) / min(times["old"]), 3),
            "new_times": times["new"],
            "old_times": times["old"],
        }
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
