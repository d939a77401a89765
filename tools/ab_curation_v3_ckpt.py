"""Three-arm interleaved A/B for curate_corpus_v3's plan shape, all on
the fold-form repetition_signals:

- `linear`      : no barrier — one lazy plan; predicate pushdown
                  collapses the staged langid/quality/fold projections
                  and duplicates their expression trees downstream
                  (165 regexp_extract_all copies in the executed plan).
- `ckpt_filter` : the COMMITTED form — lazy localCheckpoint barrier on
                  the gated survivors, then the repetition gate as a
                  FILTER on keep-passthrough columns (no join).
- `ckpt_join`   : the original r10 form — same barrier, signal frame
                  joined back by id (text as payload on that exchange).

Outputs must match row-for-row across all three.

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
    """The original r10 branch-form stages downstream of the gated frame
    (signal frame joined back by id) — the baseline arm."""
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

    def build(form: str):
        if form == "ckpt_filter":
            return training.curate_corpus_v3(
                planted, blocked, min_margin=2, domain_cap=5, hash_fn="md5"
            )
        if form == "linear":
            return training.curate_corpus_v3(
                planted, blocked, min_margin=2, domain_cap=5, hash_fn="md5",
                checkpoint_gated=False,
            )
        qual = training._corpus_gated(
            planted, blocked, "doc_id", "text", "url", "domain", 2, 150_000
        ).localCheckpoint(eager=False)
        return v3_tail(qual)

    arms = ("linear", "ckpt_filter", "ckpt_join")
    frames = {k: build(k) for k in arms}
    for x, y in (("linear", "ckpt_filter"), ("ckpt_filter", "ckpt_join")):
        diff = (
            frames[x].exceptAll(frames[y]).count()
            + frames[y].exceptAll(frames[x]).count()
        )
        print(f"output diff rows {x}/{y}: {diff}", file=sys.stderr, flush=True)
        assert diff == 0, "variants disagree — A/B void"

    times = {k: [] for k in arms}
    for rep in range(reps):
        for key in arms:
            t0 = time.time()
            build(key).write.format("noop").mode("overwrite").save()
            times[key].append(time.time() - t0)
            print(f"rep{rep} {key}: {times[key][-1]:.2f}s", file=sys.stderr, flush=True)
    mins = {k: round(min(v), 3) for k, v in times.items()}
    mins["ratio_filter_over_join"] = round(
        min(times["ckpt_filter"]) / min(times["ckpt_join"]), 3
    )
    mins["ratio_linear_over_filter"] = round(
        min(times["linear"]) / min(times["ckpt_filter"]), 3
    )
    print(json.dumps(mins))


if __name__ == "__main__":
    main()
