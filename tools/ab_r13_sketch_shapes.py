"""Interleaved A/B for the three r13 shape changes outside the curation
family, old arm reimplemented verbatim from the pre-r13 code (the ab_hits
discipline — sequential blocks do not adjudicate on this box):

1. kmv: `kmv_build` hash-BEFORE-distinct (new) vs distinct-value-then-hash
   (old), driven through the text_source_overlap shape (per-source 5-gram
   KMV + pairwise intersection) — the arm where the deduped values are
   30-60-byte gram strings and the exchange payload shrinks to 8-byte
   longs.
2. bloom: `bloom_prune` single 1-row-map crossJoin lookup (new) vs
   k_hashes sequential broadcast hash joins (old), driven through the
   x_bloom_prune_join shape.
3. boilerplate: `boilerplate_ngrams` df-count window (new) vs
   groupBy(hash) + hash self-join (old), driven through
   text_boilerplate_ngrams's shape.

Rows are identical between arms (oracle-verified separately); this tool
only adjudicates time. Usage:
    python tools/ab_r13_sketch_shapes.py [sf_dir] [reps] [arm ...]
Prints one JSON line with min/median per arm and ratios.
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
from pyspark.sql.window import Window  # noqa: E402

from reddit_twitter_big_data_pipeline_spark import schemas, session  # noqa: E402
from reddit_twitter_big_data_pipeline_spark.operators import (  # noqa: E402
    dedup,
    sketches,
)
from reddit_twitter_big_data_pipeline_spark.parallel import spread  # noqa: E402


def _kmv_build_old(df, value_col, group_cols=None, k=256, salt="kmv:"):
    """Pre-r13 kmv_build: distinct on the raw value STRING, then hash."""
    groups = list(group_cols or [])
    dv = (
        df.select(*groups, F.col(value_col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
    )
    h = dv.select(
        *groups,
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("v"))), 1, 15), 16, 10)
        .cast("long")
        .alias("hash"),
    )
    w = Window.partitionBy(*groups).orderBy(F.col("hash").asc())
    return (
        h.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _bloom_prune_old(probe, bloom, key_col, m_bits, k_hashes, salt="bloom"):
    """Pre-r13 bloom_prune: k_hashes sequential broadcast hash joins."""
    out = probe
    for j in range(k_hashes):
        pos = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(f"{salt}{j}:"), F.col(key_col).cast("string"))
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        pcol, wcol, bcol, mcol = f"__blp{j}", f"__blw{j}", f"__blb{j}", f"__blm{j}"
        side = F.broadcast(
            bloom.select(F.col("word").alias(wcol), F.col("bits").alias(bcol))
        )
        out = (
            out.withColumn(pcol, pos)
            .withColumn(wcol, F.shiftright(F.col(pcol), 6))
            .withColumn(mcol, F.expr(f"shiftleft(1L, CAST({pcol} % 64 AS INT))"))
            .join(side, wcol, "left")
            .filter(
                F.col(bcol).isNotNull() & (F.col(bcol).bitwiseAND(F.col(mcol)) != 0)
            )
            .drop(pcol, wcol, bcol, mcol)
        )
    return out


def _boilerplate_old(df, id_col="doc_id", text_col="text", k=5, min_docs=2):
    """Pre-r13 boilerplate_ngrams: groupBy(hash) df + hash self-join."""
    grams = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(dedup.shingles(text_col, k)).alias("g"),
    )
    gh = grams.select("id", F.xxhash64("g").alias("gh"))
    counts = gh.groupBy("gh").agg(F.count(F.lit(1)).alias("df_docs"))
    return (
        gh.join(counts, "gh")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("df_docs") >= min_docs, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_shared"),
        )
        .select(
            "id",
            "n_grams",
            "n_shared",
            (F.col("n_shared") / F.col("n_grams")).alias("shared_frac"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    arms = sys.argv[3:] or ["kmv", "bloom", "boilerplate"]
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    docs = schemas.load_table(spark, sf_dir, "documents")
    li = schemas.load_table(spark, sf_dir, "lineitem")
    supp = schemas.load_table(spark, sf_dir, "supplier")

    def kmv(new: bool):
        grams = docs.select("source", F.explode(dedup.shingles("text", 5)).alias("g"))
        build = sketches.kmv_build if new else _kmv_build_old
        sk = build(grams, "g", group_cols=["source"], k=128)
        return sketches.kmv_intersect_estimate(sk, ["source"], k=128)

    def bloom(new: bool):
        s = supp.filter(F.col("s_acctbal") > 6000).select("s_suppkey", "s_name")
        probe = li.select("l_suppkey", "l_extendedprice", "l_discount")
        bl = sketches.bloom_build(s, "s_suppkey", m_bits=4096, k_hashes=3)
        prune = sketches.bloom_prune if new else _bloom_prune_old
        pruned = prune(probe, bl, "l_suppkey", m_bits=4096, k_hashes=3)
        joined = pruned.join(F.broadcast(s), pruned["l_suppkey"] == s["s_suppkey"])
        return joined.groupBy("s_suppkey", "s_name").agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )

    def boilerplate(new: bool):
        fn = dedup.boilerplate_ngrams if new else _boilerplate_old
        return fn(docs, k=5, min_docs=2)

    builders = {"kmv": kmv, "bloom": bloom, "boilerplate": boilerplate}

    def run(arm: str, new: bool) -> float:
        spark.sparkContext.setJobDescription(f"ab_r13 {arm} {'new' if new else 'old'}")
        t0 = time.time()
        builders[arm](new).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)
        return round(time.time() - t0, 3)

    for a in arms:  # warm pass, untimed
        run(a, True)

    times = {a: {"new": [], "old": []} for a in arms}
    for _ in range(reps):
        for a in arms:
            times[a]["new"].append(run(a, True))
            times[a]["old"].append(run(a, False))
    out = {}
    for a in arms:
        nw, od = times[a]["new"], times[a]["old"]
        out[a] = {
            "new_min": min(nw),
            "new_median": statistics.median(nw),
            "old_min": min(od),
            "old_median": statistics.median(od),
            "ratio_min": round(min(nw) / max(min(od), 1e-9), 3),
            "new": nw,
            "old": od,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
