"""Interleaved A/B for the three r13 shape changes outside the curation
family, old arm reimplemented verbatim from the pre-r13 code (the ab_hits
discipline — sequential blocks do not adjudicate on this box):

1. kmv: `kmv_build` hash-BEFORE-distinct (new) vs distinct-value-then-hash
   (old), driven through the text_source_overlap shape (per-source 5-gram
   KMV + pairwise intersection) — the arm where the deduped values are
   30-60-byte gram strings and the exchange payload shrinks to 8-byte
   longs.
2. bloom: the COMMITTED `bloom_prune` (k_hashes sequential broadcast
   hash joins — the shape that WON the r13 adjudication) vs the three
   losing alternatives, each committed here as an explicit arm so the
   1.4-1.6× numbers in bloom_prune's docstring are reproducible
   (ADVICE r13: the original r13 tool compared the winner to itself):
   `map` — 1-row map<word,bits> crossJoin, k element_at lookups;
   `arr` — 1-row dense bits array crossJoin (BroadcastNestedLoopJoin);
   `lit` — bits array collected to the driver and embedded as a plan
   literal (adds one sequential collect job). Driven through the
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


def _bloom_pos(key_col, j, m_bits, salt="bloom"):
    """The j-th bit position for a probe key (identical hash chain to
    sketches.bloom_build/bloom_prune)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}{j}:"), F.col(key_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )


def _stage_pos(df, key_col, k_hashes, m_bits, salt):
    """Stage the k bit positions as named columns (__bp0..__bpK-1) so
    the mask expressions can reference them by name, exactly like the
    committed bloom_prune's withColumn staging."""
    for j in range(k_hashes):
        df = df.withColumn(f"__bp{j}", _bloom_pos(key_col, j, m_bits, salt))
    return df


def _bloom_cond(j, bits):
    """bits word already selected for position column __bp{j}; true iff
    the bit is set."""
    mask = F.expr(f"shiftleft(1L, CAST(__bp{j} % 64 AS INT))")
    return bits.isNotNull() & (bits.bitwiseAND(mask) != 0)


def _bloom_prune_map(probe, bloom, key_col, m_bits, k_hashes, salt="bloom"):
    """Losing r13 variant 1 (measured 1.41×): 1-row map<word,bits>
    crossJoin, k element_at lookups — Spark's MapData element_at is a
    LINEAR entry scan, paid k times per probe row."""
    m = F.broadcast(
        bloom.agg(
            F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__bm")
        )
    )
    out = _stage_pos(probe.crossJoin(m), key_col, k_hashes, m_bits, salt)
    cond = None
    for j in range(k_hashes):
        bits = F.element_at(F.col("__bm"), F.shiftright(F.col(f"__bp{j}"), 6))
        c = _bloom_cond(j, bits)
        cond = c if cond is None else cond & c
    return out.filter(cond).drop(
        "__bm", *[f"__bp{j}" for j in range(k_hashes)]
    )


def _dense_bits_row(bloom, m_bits):
    """1-row dense array<long> of the filter's words (missing words 0)."""
    n_words = m_bits // 64
    return bloom.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("__ba")
    )


def _bloom_prune_arr(probe, bloom, key_col, m_bits, k_hashes, salt="bloom"):
    """Losing r13 variant 2 (measured 1.62×): 1-row dense-array
    crossJoin — array element_at is O(1), but the 1-row broadcast side
    plans as BroadcastNestedLoopJoin, which sits OUTSIDE whole-stage
    codegen and splits the probe pipeline."""
    out = _stage_pos(
        probe.crossJoin(F.broadcast(_dense_bits_row(bloom, m_bits))),
        key_col, k_hashes, m_bits, salt,
    )
    cond = None
    for j in range(k_hashes):
        bits = F.element_at(
            F.col("__ba"), (F.shiftright(F.col(f"__bp{j}"), 6) + 1).cast("int")
        )
        c = _bloom_cond(j, bits)
        cond = c if cond is None else cond & c
    return out.filter(cond).drop(
        "__ba", *[f"__bp{j}" for j in range(k_hashes)]
    )


def _bloom_prune_lit(probe, bloom, key_col, m_bits, k_hashes, salt="bloom"):
    """Losing r13 variant 3 (measured 1.41×): dense array collected to
    the driver and embedded as a plan LITERAL — the filter itself times
    like the winner, but the bounded collect is an extra SEQUENTIAL job
    where the committed shape's lazy joins pipeline the filter build
    into the one action."""
    n_words = m_bits // 64
    got = {r["word"]: r["bits"] for r in bloom.collect()}
    arr = F.array(*[F.lit(got.get(i, 0)).cast("long") for i in range(n_words)])
    out = _stage_pos(probe, key_col, k_hashes, m_bits, salt)
    cond = None
    for j in range(k_hashes):
        bits = F.element_at(
            arr, (F.shiftright(F.col(f"__bp{j}"), 6) + 1).cast("int")
        )
        c = _bloom_cond(j, bits)
        cond = c if cond is None else cond & c
    return out.filter(cond).drop(*[f"__bp{j}" for j in range(k_hashes)])


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
    arms = sys.argv[3:] or ["kmv", "bloom_map", "bloom_arr", "bloom_lit", "boilerplate"]
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    docs = schemas.load_table(spark, sf_dir, "documents")
    li = schemas.load_table(spark, sf_dir, "lineitem")
    supp = schemas.load_table(spark, sf_dir, "supplier")

    def kmv(new: bool):
        grams = docs.select("source", F.explode(dedup.shingles("text", 5)).alias("g"))
        build = sketches.kmv_build if new else _kmv_build_old
        sk = build(grams, "g", group_cols=["source"], k=128)
        return sketches.kmv_intersect_estimate(sk, ["source"], k=128)

    _BLOOM_VARIANTS = {
        "bloom_map": _bloom_prune_map,
        "bloom_arr": _bloom_prune_arr,
        "bloom_lit": _bloom_prune_lit,
    }

    def _bloom_arm(variant):
        def bloom(new: bool):
            s = supp.filter(F.col("s_acctbal") > 6000).select("s_suppkey", "s_name")
            probe = li.select("l_suppkey", "l_extendedprice", "l_discount")
            bl = sketches.bloom_build(s, "s_suppkey", m_bits=4096, k_hashes=3)
            prune = sketches.bloom_prune if new else _BLOOM_VARIANTS[variant]
            pruned = prune(probe, bl, "l_suppkey", m_bits=4096, k_hashes=3)
            joined = pruned.join(F.broadcast(s), pruned["l_suppkey"] == s["s_suppkey"])
            return joined.groupBy("s_suppkey", "s_name").agg(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                    "revenue"
                )
            )

        return bloom

    def boilerplate(new: bool):
        fn = dedup.boilerplate_ngrams if new else _boilerplate_old
        return fn(docs, k=5, min_docs=2)

    builders = {"kmv": kmv, "boilerplate": boilerplate}
    for v in _BLOOM_VARIANTS:
        builders[v] = _bloom_arm(v)

    def run(arm: str, new: bool) -> float:
        spark.sparkContext.setJobDescription(f"ab_r13 {arm} {'new' if new else 'old'}")
        t0 = time.time()
        builders[arm](new).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)
        return round(time.time() - t0, 3)

    for a in arms:  # warm pass, untimed — and row parity between shapes
        n_new = builders[a](True).count()
        n_old = builders[a](False).count()
        assert n_new == n_old, (a, n_new, n_old)

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
