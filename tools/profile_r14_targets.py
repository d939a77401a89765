"""Phase-level profiling for the r14 optimization targets (guide §1:
measure first). Reproduces each target query's exact shape with wall-clock
timers between its internal materialization points, plus Spark job counts
per phase (statusTracker job ids), so the 10-25 s suite rows decompose
into scan/compute vs sequential-job overhead.

Targets: x_hits, x_ppr, dedup_keep_best, train_curation_increment,
train_curation_increment_v2, dedup_incremental_build.

Usage: python tools/profile_r14_targets.py [sf_dir] [target ...]
Prints one JSON line per target.
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


class Phases:
    def __init__(self, spark):
        self.spark = spark
        self.t0 = time.time()
        self.last = self.t0
        self.jobs0 = self._njobs()
        self.jlast = self.jobs0
        self.rows = []

    def _njobs(self) -> int:
        st = self.spark.sparkContext.statusTracker()
        return len(st.getJobIdsForGroup(None) or [])

    def mark(self, name: str) -> None:
        now = time.time()
        nj = self._njobs()
        self.rows.append(
            {"phase": name, "sec": round(now - self.last, 3), "jobs": nj - self.jlast}
        )
        self.last = now
        self.jlast = nj

    def done(self) -> dict:
        return {
            "total_sec": round(time.time() - self.t0, 3),
            "total_jobs": self._njobs() - self.jobs0,
            "phases": self.rows,
        }


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def prof_hits(spark, sf_dir: str) -> dict:
    from reddit_twitter_big_data_pipeline_spark.operators import model

    li = schemas.load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = schemas.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    p = Phases(spark)
    out = model.hits(edges, n_iter=6)
    p.mark("build(loop collects)")
    _noop(out)
    p.mark("final noop")
    return p.done()


def prof_ppr(spark, sf_dir: str) -> dict:
    import importlib.util as ilu

    spec = ilu.spec_from_file_location("entry", os.path.join(REPO, "__spark_entry__.py"))
    entry = ilu.module_from_spec(spec)
    spec.loader.exec_module(entry)
    fn = entry.queries()["x_ppr"]
    p = Phases(spark)
    df = fn(spark, sf_dir)
    p.mark("build(loop collects)")
    _noop(df)
    p.mark("final noop")
    return p.done()


def prof_keep_best(spark, sf_dir: str) -> dict:
    from reddit_twitter_big_data_pipeline_spark.operators import dedup

    docs = schemas.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copy = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    docs = docs.unionByName(copy)
    p = Phases(spark)
    pairs = dedup.jaccard_pairs(docs, threshold=0.9)
    p.mark("pairs plan build")
    # replicate connected_components' internals to time the count
    comp = dedup.connected_components(pairs)
    p.mark("cc (edges ckpt + count + peel plan)")
    out = dedup.dedup_keep_best(
        docs.withColumn("q", F.length("text")), pairs, "q"
    ).select("doc_id")
    p.mark("keep_best plan build (2nd cc!)")
    _noop(out)
    p.mark("final noop")
    _noop(comp)
    p.mark("comp noop (cached edges)")
    return p.done()


def prof_increment(spark, sf_dir: str, v2: bool) -> dict:
    import importlib.util as ilu

    spec = ilu.spec_from_file_location("entry", os.path.join(REPO, "__spark_entry__.py"))
    entry = ilu.module_from_spec(spec)
    spec.loader.exec_module(entry)
    name = "train_curation_increment_v2" if v2 else "train_curation_increment"
    fn = entry.queries()[name]
    p = Phases(spark)
    df = fn(spark, sf_dir)
    p.mark("build (incl. eager probe ckpt for v2)")
    _noop(df)
    p.mark("final noop")
    return p.done()


def prof_inc_build(spark, sf_dir: str) -> dict:
    from reddit_twitter_big_data_pipeline_spark.operators import dedup

    docs = schemas.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    replicas = [
        F.struct(
            (F.col("doc_id") + r * 1000000).alias("doc_id"),
            (
                F.col("text")
                if r == 0
                else F.regexp_replace(F.col("text"), F.lit(" "), F.lit(f" r{r} "))
            ).alias("text"),
        )
        for r in range(8)
    ]
    corpus = docs.select(F.explode(F.array(*replicas)).alias("s")).select(
        "s.doc_id", "s.text"
    )
    p = Phases(spark)
    _noop(corpus)
    p.mark("corpus construction alone (noop)")
    state = dedup.minhash_corpus_state(corpus)
    p.mark("state plan build")
    _noop(state[0])
    p.mark("ex materialize (shingle+hash)")
    _noop(state[1])
    p.mark("band materialize (sigs+bands)")
    for f in state:
        f.unpersist()
    return p.done()


TARGETS = {
    "x_hits": prof_hits,
    "x_ppr": prof_ppr,
    "dedup_keep_best": prof_keep_best,
    "train_curation_increment": lambda s, d: prof_increment(s, d, False),
    "train_curation_increment_v2": lambda s, d: prof_increment(s, d, True),
    "dedup_incremental_build": prof_inc_build,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:] or list(TARGETS)
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # warmup
    spark.range(10_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for name in only:
        res = TARGETS[name](spark, sf_dir)
        print(json.dumps({"target": name, **res}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
