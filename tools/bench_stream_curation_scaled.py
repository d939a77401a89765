"""Scaled bench for STREAMING incremental admission
(`streaming/curation.py:curate_stream_v2`): the thesis inherited from
`curate_increment_v2` is that admitting a fixed micro-batch costs ~the
batch, not the standing corpus — the corpus participates only through
its stored reductions (fp set, band table, shingle rows, domain
counts), which are probed by bucket-keyed joins, never re-shingled or
re-shuffled in full.

Method (mirrors tools/bench_curation_scaled.py mode `increment`): the
corpus state tables are materialized directly at 1x/4x/16x replica
scale (the salted-replica corpus from bench_curation_scaled, seeded
under the pre-stream partition `__batch=-1`), then ONE fixed parquet
micro-batch streams through curate_stream_v2 under Trigger.AvailableNow
with a fresh checkpoint per rep. Reps are INTERLEAVED across scales
(rep 0: 1x,4x,16x; rep 1: ...) with min-per-cell so ambient drift
cannot masquerade as a scaling trend. Each rep's own state writes land
at `__batch=0` and are invisible to the next rep's batch-0 read
(`__batch < 0` filter) and idempotently overwritten — the replay
machinery doubles as the bench reset.

Done-bar: t(16x)/t(1x) near-flat (the batch-side gates and windows
dominate; the corpus-side contribution is partition-pruned state scans
and one bucket-keyed probe join).

Usage: python tools/bench_stream_curation_scaled.py [sf_dir] [reps] [workdir]
       [mode: lifetime|daily]  (daily = r12 quota_mode='daily': the batch
       spreads over three event days, seeded domain counts carry the
       SEED_DAY key — same flat done-bar, now for the day-keyed path)
Prints one JSON line: {scale: min_sec}, state rows, admitted rows, ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench_curation_scaled import corpus, fixed_batch  # noqa: E402
from reddit_twitter_big_data_pipeline_spark import session  # noqa: E402
from reddit_twitter_big_data_pipeline_spark.operators import dedup as dedup_ops  # noqa: E402
from reddit_twitter_big_data_pipeline_spark.operators import text as text_ops  # noqa: E402
from reddit_twitter_big_data_pipeline_spark.sinks.writers import overwrite_partitions  # noqa: E402
from reddit_twitter_big_data_pipeline_spark.streaming import curation, streams  # noqa: E402

SCALES = (1, 4, 16)
NUM_PERM, K, BANDS = 64, 3, 16
SEED_DAY = "2023-03-01"


def seed_state(spark, corpus_df, state_dir: str, daily: bool = False) -> dict:
    """Materialize the stored reductions curate_stream_v2 maintains, as
    they would exist after the corpus was admitted — seeded at
    `__batch=-1` so a batch-0 probe sees all of it. With `daily`, the
    domain counts carry the day key (the whole seeded corpus lands on
    SEED_DAY, so batch rows dated SEED_DAY probe non-empty counts and
    later-day rows open fresh caps — both daily paths exercised)."""
    bcol = F.lit(-1).alias("__batch")
    overwrite_partitions(
        corpus_df.select(text_ops.fingerprint("text").alias("__fp"))
        .distinct()
        .select("*", bcol),
        os.path.join(state_dir, "fps"),
        ["__batch"],
    )
    ex = dedup_ops.hashed_shingles(corpus_df, "doc_id", "text", K).persist()
    overwrite_partitions(
        ex.select("*", bcol), os.path.join(state_dir, "shingles"), ["__batch"]
    )
    overwrite_partitions(
        dedup_ops._band_frame(
            dedup_ops.minhash_signatures_from_hashes(ex, NUM_PERM),
            BANDS,
            NUM_PERM // BANDS,
        ).select("*", bcol),
        os.path.join(state_dir, "bands"),
        ["__batch"],
    )
    dom = corpus_df.select(text_ops.registered_domain("url").alias("domain"))
    if daily:
        dom = dom.withColumn("__day", F.lit(SEED_DAY).cast("date"))
        counts = dom.groupBy("domain", "__day").agg(F.count(F.lit(1)).alias("n"))
    else:
        counts = dom.groupBy("domain").agg(F.count(F.lit(1)).alias("n"))
    overwrite_partitions(
        counts.select("*", bcol),
        os.path.join(state_dir, "domains"),
        ["__batch"],
    )
    n_sh = ex.count()
    ex.unpersist()
    return {"shingle_rows": n_sh}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/stream_curation_scaled"
    mode = sys.argv[4] if len(sys.argv) > 4 else "lifetime"
    daily = mode == "daily"
    shutil.rmtree(work, ignore_errors=True)
    spark = session.get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    batch_dir = os.path.join(work, "batch")
    b = fixed_batch(spark, sf_dir)
    if daily:
        # spread the batch over SEED_DAY..+2: day-1 rows probe the seeded
        # (domain, day) counts, later days open fresh caps
        b = b.withColumn(
            "date",
            F.date_format(
                F.date_add(F.lit(SEED_DAY).cast("date"),
                           (F.col("doc_id") % 3).cast("int")),
                "yyyy-MM-dd 12:00:00",
            ),
        )
    b.write.parquet(batch_dir)
    schema = spark.read.parquet(batch_dir).schema

    meta: dict = {}
    for s in SCALES:
        sd = os.path.join(work, f"state_{s}x")
        meta[s] = seed_state(spark, corpus(spark, sf_dir, s), sd, daily=daily)
        print(f"seeded {s}x: {meta[s]}", file=sys.stderr, flush=True)

    def run_once(s: int, rep: int) -> tuple[float, int]:
        ck = os.path.join(work, f"ckpt_{s}x_{rep}")
        out = os.path.join(work, f"out_{s}x")
        src = streams.read_parquet_stream(spark, batch_dir, schema)
        t0 = time.time()
        kw = dict(quota_mode="daily", date_col="date") if daily else {}
        q = curation.curate_stream_v2(
            src,
            state_dir=os.path.join(work, f"state_{s}x"),
            out_dir=out,
            checkpoint=ck,
            domain_cap=20,
            q_micro_min=150_000,
            **kw,
        )
        streams.run_to_completion(q)
        dt = time.time() - t0
        return dt, spark.read.parquet(out).count()

    times = {s: [] for s in SCALES}
    admitted = {}
    for rep in range(reps):
        for s in SCALES:
            dt, n = run_once(s, rep)
            times[s].append(dt)
            admitted[s] = n
            print(f"rep{rep} {s}x: {dt:.2f}s admitted={n}", file=sys.stderr, flush=True)
    out = {
        "mode": f"stream_v2_{mode}",
        "min_sec": {str(s): round(min(ts), 3) for s, ts in times.items()},
        "state_shingle_rows": {str(s): meta[s]["shingle_rows"] for s in SCALES},
        "admitted": {str(s): admitted[s] for s in SCALES},
        "ratio_16x_over_1x": round(min(times[16]) / min(times[1]), 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
