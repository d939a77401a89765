"""Interleaved A/B: the committed repetition_signals (per-row sorted-array
FOLD — zero shuffles) vs the explode + groupBy + min_by reconstruction
(the best explode-family variant: hash agg, map-side partial, no window
sort). Both implement the identical integer decisions (run length IS the
occurrence count; strictly-greater best-run over ASC-sorted grams IS the
count-desc/gram-asc argmax), so outputs must match row-for-row; the
question is only the plan. History: the row_number-window vs min_by A/B
measured parity (1.004x, r10), identifying the explode itself as the
cost — this fold form removes it.

Usage: python tools/ab_repetition.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from reddit_twitter_big_data_pipeline_spark import schemas, session  # noqa: E402
from reddit_twitter_big_data_pipeline_spark.operators import text as text_ops  # noqa: E402


def planted(spark, sf_dir: str) -> DataFrame:
    docs = schemas.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.when(
            d % 4 == 1,
            F.concat_ws(
                "\n", F.col("text"), F.col("text"),
                F.concat(F.lit("tail "), d.cast("string")),
            ),
        )
        .when(d % 4 == 2, F.concat(F.col("text"), F.expr("repeat(' click here', 10)")))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def signals_minby(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The explode-family baseline: line/gram explode + groupBy counts,
    top-gram via min_by(struct(-c, g)) — the faster of the two explode
    variants from the r10 parity A/B."""
    base = df.select(
        F.col(id_col),
        F.split(F.col(col), "\n").alias("__lines"),
        F.length(text_ops.normalize_text(col)).alias("__nchars"),
    )
    lines = base.select(id_col, F.explode("__lines").alias("__l"))
    line_stats = (
        lines.groupBy(id_col, "__l")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
            .cast("long")
            .alias("__dup_lines"),
            F.sum(F.col("__c") * F.length("__l")).cast("long").alias("__line_chars"),
            F.sum(
                F.when(F.col("__c") > 1, F.col("__c") * F.length("__l")).otherwise(0)
            )
            .cast("long")
            .alias("__dup_line_chars"),
        )
    )
    toks = F.split(text_ops.normalize_text(col), " ")
    n = F.size(toks)
    grams = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        )
    )
    gr = df.select(F.col(id_col), F.explode(grams).alias("__g"))
    top_gram = (
        gr.groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.min_by(
                F.struct(F.col("__c"), F.length("__g").alias("__gl")),
                F.struct((-F.col("__c")).alias("nc"), F.col("__g").alias("g")),
            ).alias("__top")
        )
        .select(
            F.col(id_col),
            F.col("__top.__c").alias("__top_cnt"),
            F.col("__top.__gl").alias("__top_len"),
        )
    )
    return (
        base.select(id_col, "__nchars")
        .join(line_stats, id_col, "left")
        .join(top_gram, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_lines"),
            (F.col("__dup_lines").cast("double") / F.col("n_lines")).alias(
                "dup_line_frac"
            ),
            (
                F.col("__dup_line_chars").cast("double")
                / F.greatest(F.col("__line_chars"), F.lit(1))
            ).alias("dup_line_char_frac"),
            F.coalesce(
                F.col("__top_cnt") * F.col("__top_len")
                / F.greatest(F.col("__nchars"), F.lit(1)).cast("double"),
                F.lit(0.0),
            ).alias("top_bigram_char_frac"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    df = planted(spark, sf_dir)

    a = text_ops.repetition_signals(df)
    b = signals_minby(df)
    # value identity first — an A/B between non-identical plans is void
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"output diff rows: {diff}", file=sys.stderr, flush=True)
    assert diff == 0, "variants disagree — A/B void"

    times = {"fold": [], "explode_minby": []}
    for key, frame in (("fold", a), ("explode_minby", b)):  # warm both
        frame.write.format("noop").mode("overwrite").save()
    for rep in range(reps):
        for key, frame in (("fold", a), ("explode_minby", b)):
            t0 = time.time()
            frame.write.format("noop").mode("overwrite").save()
            times[key].append(time.time() - t0)
            print(f"rep{rep} {key}: {times[key][-1]:.2f}s", file=sys.stderr, flush=True)
    mins = {k: round(min(v), 3) for k, v in times.items()}
    mins["ratio_fold_over_explode"] = round(
        min(times["fold"]) / min(times["explode_minby"]), 3
    )
    print(json.dumps(mins))


if __name__ == "__main__":
    main()
