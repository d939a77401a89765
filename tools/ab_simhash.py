"""Interleaved A/B for the `_bucket_pairs` grouped-bucket form vs the r5
persisted cap+self-join form of `simhash_near_pairs` (VERDICT r6 item 2:
the fix must measure ≤1.05× of the PERSISTED form, judged by interleaved
min-of-N in ONE session — sequential blocks mislead under ambient load).

Arm `grouped`  : current simhash_near_pairs (single-pass `_bucket_pairs`).
Arm `persisted`: reconstruction of the r5 shape — chunk frame persisted,
count-aggregate cap → broadcast anti-join → bucket self-join — with an
explicit unpersist between reps so the arms don't interact.

Usage: python tools/ab_simhash.py [sf_dir] [reps]
Prints one JSON line with min/median per arm and the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from reddit_twitter_big_data_pipeline_spark.operators import dedup  # noqa: E402


def persisted_simhash_pairs(df, max_distance=0, hash_fn="md5", max_bucket_size=1000):
    """The r5 shape, reconstructed for the A/B baseline arm."""
    chunk_bits = 16 if hash_fn == "xxhash64" else 15
    mask = (1 << chunk_bits) - 1
    sigs = dedup.simhash_signatures(df, "doc_id", "text", hash_fn)
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("simhash"), i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", "cc.chunk", "cc.key")
    chunks = chunks.persist()
    over = (
        chunks.groupBy("chunk", "key")
        .agg(F.count(F.lit(1)).alias("__bsz"))
        .filter(F.col("__bsz") > max_bucket_size)
        .select("chunk", "key")
    )
    capped = chunks.join(F.broadcast(over), ["chunk", "key"], "left_anti")
    left = capped.select(F.col("id").alias("a"), F.col("simhash").alias("sig_a"), "chunk", "key")
    right = capped.select(F.col("id").alias("b"), F.col("simhash").alias("sig_b"), "chunk", "key")
    pairs = (
        left.join(right, ["chunk", "key"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("distance", dedup.hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("distance") <= max_distance)
        .select("a", "b", "distance")
        .distinct()
    )
    return pairs, chunks


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("ab_simhash")
        .getOrCreate()
    )
    docs = entry._docs_with_planted_dups(spark, sf_dir)
    times = {"grouped": [], "persisted": []}
    counts = set()
    for rep in range(reps):
        for arm in ("grouped", "persisted"):  # interleaved
            t0 = time.time()
            if arm == "grouped":
                n = dedup.simhash_near_pairs(docs, max_distance=0, hash_fn="md5").count()
            else:
                pairs, cached = persisted_simhash_pairs(docs)
                n = pairs.count()
                cached.unpersist()
            times[arm].append(time.time() - t0)
            counts.add(n)
    assert len(counts) == 1, f"arms disagree on pair count: {counts}"
    mins = {a: min(t) for a, t in times.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "pairs": counts.pop(),
                "times": {a: [round(x, 3) for x in t] for a, t in times.items()},
                "min": {a: round(v, 3) for a, v in mins.items()},
                "ratio_grouped_vs_persisted": round(mins["grouped"] / mins["persisted"], 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
