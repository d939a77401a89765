"""Interleaved A/B: curate_corpus_v3's double-executed gated subtree —
the committed recompute-both-branches form vs an eager localCheckpoint
of the gated frame before the repetition semi-join. The checkpoint
trades a second scan-and-project pass for materializing the gated
survivors (corpus-scale WITH text — fine locally, a deliberate
non-default at 100 TB; see the curate_corpus_v3 docstring). This A/B
quantifies the LOCAL profile only.

Usage: python tools/ab_curation_v3_ckpt.py [sf_dir] [reps]
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
from reddit_twitter_big_data_pipeline_spark.operators import (  # noqa: E402
    dedup as dedup_ops,
    sampling,
    text as text_ops,
)
from reddit_twitter_big_data_pipeline_spark.plans import training  # noqa: E402


def inputs(spark, sf_dir: str):
    docs = schemas.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    lang_case = None
    phrases = {
        1: "der hund läuft über die straße und ist nicht müde ",
        2: "le chat est dans la maison et ne veut pas sortir ",
        3: "el perro está en la casa y no quiere salir más ",
        4: "il gatto è nel giardino e non vuole più uscire ",
    }
    for k, ph in phrases.items():
        c = d % 5 == k
        v = F.concat(F.lit(ph * 3), F.col("text"))
        lang_case = F.when(c, v) if lang_case is None else lang_case.when(c, v)
    base = lang_case.otherwise(F.col("text"))
    stuffed = F.when(
        d % 9 == 7, F.concat(base, F.expr("repeat(' click here', 40)"))
    ).otherwise(base)
    planted = docs.select(
        "doc_id",
        stuffed.alias("text"),
        F.concat(
            F.lit("https://sub.site"), (d % 40).cast("string"),
            F.lit(".com/p/"), d.cast("string"),
        ).alias("url"),
    )
    blocked = spark.createDataFrame([("site5.com",), ("site15.com",)], ["domain"])
    return planted, blocked


def v3_tail(qual, domain_cap=5, hash_fn="md5"):
    """The committed v3 stages downstream of the gated frame."""
    rep_ok = (
        text_ops.repetition_signals(qual.select("doc_id", "text"))
        .filter(
            (F.floor(F.col("dup_line_frac") * F.lit(1e6)).cast("long") <= 300_000)
            & (
                F.floor(F.col("top_bigram_char_frac") * F.lit(1e6)).cast("long")
                <= 200_000
            )
        )
        .select("doc_id")
    )
    kept = qual.join(rep_ok, "doc_id")
    quota = sampling.cap_per_group(kept, "domain", domain_cap, id_col="doc_id", hash_fn=hash_fn)
    deduped = dedup_ops.exact_dedupe(quota, id_col="doc_id", text_col="text")
    return deduped.select(
        "doc_id", "lang", "domain",
        sampling.split_label("doc_id", hash_fn=hash_fn).alias("split"),
        text_ops.token_count("text").cast("long").alias("n_tokens"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    planted, blocked = inputs(spark, sf_dir)

    def build(ckpt: bool):
        qual = training._corpus_gated(
            planted, blocked, "doc_id", "text", "url", "domain", 2, 150_000
        )
        if ckpt:
            qual = qual.localCheckpoint(eager=True)
        return v3_tail(qual)

    a = build(False)
    b = build(True)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"output diff rows: {diff}", file=sys.stderr, flush=True)
    assert diff == 0, "variants disagree — A/B void"

    times = {"recompute": [], "checkpoint": []}
    for rep in range(reps):
        for key, ck in (("recompute", False), ("checkpoint", True)):
            t0 = time.time()
            build(ck).write.format("noop").mode("overwrite").save()
            times[key].append(time.time() - t0)
            print(f"rep{rep} {key}: {times[key][-1]:.2f}s", file=sys.stderr, flush=True)
    mins = {k: round(min(v), 3) for k, v in times.items()}
    mins["ratio_ckpt_over_recompute"] = round(
        min(times["checkpoint"]) / min(times["recompute"]), 3
    )
    print(json.dumps(mins))


if __name__ == "__main__":
    main()
