"""Interleaved A/B for the r9 langid-family plan changes at sf0.1
(VERDICT r8 items 2-3):

1. `langid_profile` / `langid_margin` now STAGE `lower(text)` and the
   langid token array once and compute the 7 integer language scores as
   staged columns (`operators/text.py:_langid_scored`). The r8 fused
   form rebuilt split(regexp_replace(lower(text))) once per score
   REFERENCE — the argmax CASE chain alone holds ~28 references —
   because higher-order-function folds sit outside codegen
   subexpression elimination (the r3 `quality_signals` lesson).
2. `text_langid_gate` derives lang_pred inline on the same scan
   (`langid_profile(keep=("text",))`) instead of the r8 doc_id
   self-join of the profile back onto the corpus — one fewer Exchange
   of the whole documents table.

Arm `staged`: current operators (r9 bodies).
Arm `fused`:  verbatim r8 expression shapes, reconstructed from
              `git show e52a631:reddit_twitter_big_data_pipeline_spark/operators/text.py`
              (fused `langid_score` per reference; gate = profile
              joined back on doc_id) — the kept `langid_score` helper
              IS the r8 fused builder, so the reconstruction shares its
              exact code.

Integer scoring is arithmetic-identical between the arms (same adds,
same comparisons), so equality is asserted on an order-independent
xxhash64 checksum over every output column — the same columns the
timing terminal computes, so neither arm can win by column pruning.

Bench noise on this box swings sequential blocks 1.3-4x; only
interleaved min-of-N in ONE session adjudicates a perf claim
(BASELINE.md r5/r6 notes).

Usage: python tools/ab_langid.py [sf_dir] [reps]
Prints one JSON line: per-query min/median per arm + staged/fused ratios.
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
from reddit_twitter_big_data_pipeline_spark.operators import text as text_ops  # noqa: E402

LANGS = text_ops.LANGID_LANGS


def planted_docs(spark, sf_dir: str) -> DataFrame:
    """The registrations' planted multilingual corpus (doc_id%5 prefix
    rotation — mirrors __spark_entry__._planted_lang_text verbatim)."""
    docs = schemas.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    phrases = {
        1: "der hund läuft über die straße und ist nicht müde ",
        2: "le chat est dans la maison et ne veut pas sortir ",
        3: "el perro está en la casa y no quiere salir más ",
        4: "il gatto è nel giardino e non vuole più uscire ",
    }
    expr = None
    for k, ph in phrases.items():
        c = F.col("doc_id") % 5 == k
        v = F.concat(F.lit(ph * 3), F.col("text"))
        expr = F.when(c, v) if expr is None else expr.when(c, v)
    planted = expr.otherwise(F.col("text"))
    return docs.select("doc_id", planted.alias("text"))


# --- r8 fused reconstructions (e52a631 bodies) -----------------------------


def fused_profile(df: DataFrame) -> DataFrame:
    scores = {lang: text_ops.langid_score("text", lang) for lang in LANGS}
    return df.select(
        F.col("doc_id"),
        *[scores[lang].alias(f"s_{lang}") for lang in LANGS],
        text_ops._langid_pred(scores).alias("lang_pred"),
        F.greatest(*scores.values()).cast("int").alias("score"),
    )


def fused_margin(df: DataFrame, min_margin: int = 2) -> DataFrame:
    scores = {lang: text_ops.langid_score("text", lang) for lang in LANGS}
    arr = F.sort_array(F.array(*scores.values()), asc=False)
    margin = (arr[0] - arr[1]).cast("int")
    pred = text_ops._langid_pred(scores)
    return df.select(
        F.col("doc_id"),
        pred.alias("lang_pred"),
        F.greatest(*scores.values()).cast("int").alias("score"),
        margin.alias("margin"),
        F.when((pred != F.lit("und")) & (margin >= F.lit(min_margin)), pred)
        .otherwise(F.lit("und"))
        .alias("lang_conf"),
    )


def _gate_tail(scored: DataFrame) -> DataFrame:
    thr = scored.groupBy("lang_pred").agg(
        F.expr("percentile(__q, 0.75)").alias("__thr")
    )
    return (
        scored.join(F.broadcast(thr), "lang_pred")
        .filter(F.col("__q") >= F.col("__thr"))
        .select("doc_id", "lang_pred", F.round("__q", 6).alias("quality"))
    )


def fused_gate(df: DataFrame) -> DataFrame:
    scored = df.join(
        fused_profile(df).select("doc_id", "lang_pred"), "doc_id"
    ).withColumn("__q", text_ops.quality_score("text"))
    return _gate_tail(scored)


# --- r9 staged forms (current operators) -----------------------------------


def staged_gate(df: DataFrame) -> DataFrame:
    scored = text_ops.langid_profile(df, keep=("text",)).select(
        "doc_id", "lang_pred", text_ops.quality_score("text").alias("__q")
    )
    return _gate_tail(scored)


def checksum(df: DataFrame):
    """Order-independent checksum forcing EVERY output column."""
    return df.agg(
        F.expr(
            "bit_xor(xxhash64(" + ", ".join(df.columns) + "))"
        ).alias("h"),  # xor, not sum: ANSI mode overflows a long sum
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    df = planted_docs(spark, sf_dir)

    builds = {
        "langid": {"staged": lambda: text_ops.langid_profile(df), "fused": lambda: fused_profile(df)},
        "margin": {"staged": lambda: text_ops.langid_margin(df, min_margin=2), "fused": lambda: fused_margin(df)},
        "gate": {"staged": lambda: staged_gate(df), "fused": lambda: fused_gate(df)},
    }

    # warm + equality gate
    for qname, arms in builds.items():
        hs = {arm: checksum(fn()) for arm, fn in arms.items()}
        assert hs["staged"] == hs["fused"], (qname, hs)
        print(f"warm {qname}: checksums equal n={hs['staged'].n}", file=sys.stderr, flush=True)

    times = {q: {a: [] for a in ("staged", "fused")} for q in builds}
    for rep in range(reps):
        for qname, arms in builds.items():
            for arm, fn in arms.items():
                t0 = time.time()
                checksum(fn())
                times[qname][arm].append(time.time() - t0)
                print(
                    f"rep{rep} {qname}/{arm}: {times[qname][arm][-1]:.2f}s",
                    file=sys.stderr,
                    flush=True,
                )
    out = {}
    for qname, per_arm in times.items():
        out[qname] = {
            arm: {"min": round(min(ts), 3), "median": round(statistics.median(ts), 3)}
            for arm, ts in per_arm.items()
        }
        out[qname]["ratio_min"] = round(
            out[qname]["staged"]["min"] / out[qname]["fused"]["min"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
