"""Streaming curation (streaming/curation.py): the batch curate_* gate
stack applied to a document stream — row-local gates, fp-dedup within the
watermark, and the stateful per-domain quota admitter."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_twitter_big_data_pipeline_spark.streaming import curation, streams

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("date", T.StringType()),
    ]
)

# English sentences that clear the word-profile langid gate at margin 1
_EN = [
    "the cat and the dog walked to the market and it was a good day for everyone there",
    "she said that they would have been at the house with their friends all day long",
    "it is not that they could not have done this before but the time was never right",
    "when we went to the store we found that all of the things were already sold out",
    "he was sure that this would be the best of all the days they had seen this year",
]


def _write_batch(dirpath, name: str, rows: list[dict], mtime: int) -> None:
    # batch order follows file MTIME — pin it so replay order is stable
    dirpath.mkdir(parents=True, exist_ok=True)
    p = dirpath / name
    p.write_text(json.dumps(rows))
    os.utime(p, (mtime, mtime))


def _doc(i: int, text: str, host: str, minute: int) -> dict:
    return {
        "doc_id": i,
        "text": text,
        "url": f"https://{host}/p/{i}",
        "date": f"2023-03-25 12:{minute:02d}:00",
    }


def _run(spark, land, tmp_path, name: str, **kw):
    src = streams.read_json_stream(
        spark, str(land), DOC_SCHEMA, max_files_per_trigger=1
    ).withColumn("ts", F.to_timestamp("date", "yyyy-MM-dd HH:mm:ss"))
    out = curation.curate_stream(src, **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    streams.run_to_completion(q)
    return spark.sql(f"select * from {name}").collect()


def test_domain_quota_admit_caps_across_batches(spark, tmp_path):
    """State carries across micro-batches: a domain filled in batch 1
    admits only its remaining quota in batch 2; a fresh domain admits up
    to the cap; within a batch, min-id rows win."""
    land = tmp_path / "land"
    _write_batch(
        land, "1.json",
        [{"doc_id": i, "domain": "a.com"} for i in (2, 1)],  # unsorted on purpose
        mtime=1,
    )
    _write_batch(
        land, "2.json",
        [{"doc_id": 3, "domain": "a.com"}, {"doc_id": 4, "domain": "a.com"},
         {"doc_id": 10, "domain": "b.com"}],
        mtime=2,
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("domain", T.StringType())]
    )
    src = streams.read_json_stream(spark, str(land), schema, max_files_per_trigger=1)
    out = curation.domain_quota_admit(src, cap=3)
    q = (
        out.writeStream.format("memory")
        .queryName("quota")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_quota"))
        .trigger(availableNow=True)
        .start()
    )
    streams.run_to_completion(q)
    got = sorted(r.doc_id for r in spark.sql("select * from quota").collect())
    # a.com: 1,2 in batch 1, then only 3 (cap 3) in batch 2; b.com: 10
    assert got == [1, 2, 3, 10]


def test_domain_quota_admit_min_ids_across_arrow_chunks(spark, tmp_path):
    """The group arrives as MULTIPLE Arrow chunks when it exceeds
    maxRecordsPerBatch; the admitted set must still be the globally
    smallest ids of the whole micro-batch group, not per-chunk winners."""
    land = tmp_path / "land"
    # descending ids: the globally smallest ids sit in the LAST chunk,
    # so a per-chunk head() would admit 9,8 instead of 1,2
    _write_batch(
        land, "1.json",
        [{"doc_id": i, "domain": "a.com"} for i in (9, 8, 7, 6, 5, 4, 3, 2, 1)],
        mtime=1,
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("domain", T.StringType())]
    )
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        src = streams.read_json_stream(spark, str(land), schema)
        out = curation.domain_quota_admit(src, cap=2)
        q = (
            out.writeStream.format("memory")
            .queryName("quota_chunks")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_chunks"))
            .trigger(availableNow=True)
            .start()
        )
        streams.run_to_completion(q)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    got = sorted(r.doc_id for r in spark.sql("select * from quota_chunks").collect())
    assert got == [1, 2]


def test_curate_stream_gates_dedup_and_quota(spark, tmp_path):
    """End-to-end: garbage text drops at langid, a blocked domain drops at
    the anti-join, a cross-batch duplicate drops at the watermark fp-dedup
    (different id, different url — same content), and the per-domain cap
    holds across batches."""
    land = tmp_path / "land"
    _write_batch(
        land, "1.json",
        [
            _doc(1, _EN[0], "a.site1.com", 0),
            _doc(2, _EN[1], "b.site1.com", 1),
            _doc(3, "zzz qqq xxx vvv kkk", "a.site2.com", 2),  # fails langid
            _doc(4, _EN[2], "bad.blocked.com", 3),  # blocked domain
        ],
        mtime=1,
    )
    _write_batch(
        land, "2.json",
        [
            _doc(5, _EN[0], "c.site1.com", 5),  # duplicate CONTENT of doc 1
            _doc(6, _EN[3], "d.site1.com", 6),  # site1.com already at cap
            _doc(7, _EN[4], "e.site3.com", 7),  # fresh domain -> admitted
        ],
        mtime=2,
    )
    blocked = spark.createDataFrame([("blocked.com",)], ["domain"])
    rows = _run(
        spark, land, tmp_path, "curated",
        blocked=blocked, min_margin=1, q_micro_min=1,
        domain_cap=2, dedup_delay="1 hour",
    )
    admitted = sorted((r.doc_id, r.domain, r.lang) for r in rows)
    assert admitted == [
        (1, "site1.com", "en"),
        (2, "site1.com", "en"),
        (7, "site3.com", "en"),
    ]
    # the admitted schema keeps everything downstream needs
    assert {"doc_id", "text", "url", "ts", "lang", "domain"} <= {
        f for f in rows[0].asDict()
    }


def test_curate_stream_replay_is_idempotent(spark, tmp_path):
    """Re-running over the same checkpoint admits nothing new (the W5
    exactly-once discipline applies to the stateful quota too)."""
    land = tmp_path / "land"
    _write_batch(land, "1.json", [_doc(1, _EN[0], "a.site1.com", 0)], mtime=1)

    out_dir = str(tmp_path / "out")

    def run() -> None:
        src = streams.read_json_stream(
            spark, str(land), DOC_SCHEMA, max_files_per_trigger=1
        ).withColumn("ts", F.to_timestamp("date", "yyyy-MM-dd HH:mm:ss"))
        out = curation.curate_stream(
            src, min_margin=1, q_micro_min=1, domain_cap=2
        )
        q = (
            out.writeStream.foreachBatch(
                lambda batch, _id: batch.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_replay"))
            .trigger(availableNow=True)
            .start()
        )
        streams.run_to_completion(q)

    run()
    run()  # same checkpoint, no new files -> no batches replay
    assert spark.read.parquet(out_dir).count() == 1
