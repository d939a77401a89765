"""Empty-input hardening: every operator family must return an EMPTY result
(never crash, never return garbage rows) when handed zero rows — the edge
every real pipeline hits on a quiet ingest window or an over-aggressive
filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_twitter_big_data_pipeline_spark.operators import (
    analytics,
    dedup,
    model,
    sampling,
    similarity,
    temporal,
    text as text_ops,
)


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_dedup_family_empty(spark):
    docs = _empty_docs(spark)
    assert dedup.exact_dedupe(docs).count() == 0
    assert dedup.jaccard_pairs(docs).count() == 0
    assert dedup.minhash_dedup_pairs(docs).count() == 0
    assert dedup.simhash_near_pairs(docs).count() == 0
    assert dedup.minhash_incremental_pairs(docs, _empty_docs(spark)).count() == 0


def test_text_family_empty(spark):
    docs = _empty_docs(spark)
    assert text_ops.quality_signals(docs).count() == 0
    assert text_ops.text_profile(docs).count() == 0
    assert text_ops.clean_for_training(docs).count() == 0
    assert text_ops.chunk_documents(docs).count() == 0


def test_analytics_family_empty(spark):
    ev = _empty_events(spark)
    assert analytics.rolling_zscore(ev, "value", keys=["event_type"]).count() == 0
    assert analytics.mad_outliers(ev, "value", keys=["event_type"]).count() == 0
    assert analytics.event_sequences(ev).count() == 0
    assert analytics.event_transitions(ev).count() == 0
    assert analytics.cohort_retention(ev, user_col="user_id").count() == 0


def test_temporal_and_sampling_empty(spark):
    ev = _empty_events(spark)
    assert temporal.resample_ffill(ev, "value", keys=["event_type"]).count() == 0
    left = spark.createDataFrame([], "eid long, k string, t long")
    right = spark.createDataFrame([], "k string, rt long, payload string")
    assert temporal.as_of_join(left, right, ["k"], "t", "rt").count() == 0
    docs = _empty_docs(spark).withColumn("source", F.lit("s"))
    assert sampling.cap_per_group(docs, "source", 5).count() == 0
    assert sampling.temperature_weights(docs) == {}


def test_graph_and_cdc_empty(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert model.k_core(edges, k=2).count() == 0
    assert model.pagerank(edges, n_iter=2).count() == 0
    base = spark.createDataFrame([], "k long, s string, t long")
    changes = spark.createDataFrame([], "k long, s string, t long, op string")
    assert model.apply_cdc(base, changes, ["k"], "t").count() == 0


def test_null_text_rows_survive_sanely(spark):
    """A null-text row must flow through the text stack without crashing:
    quality gates reject it (keep=False, never null), profiles carry nulls,
    and pair generators simply find no pairs for it."""
    docs = spark.createDataFrame(
        [(1, None), (2, "real text here")], "doc_id long, text string"
    )
    q = {r.doc_id: r for r in text_ops.quality_signals(docs).collect()}
    assert q[1].keep is False and q[1].n_words is None
    assert text_ops.text_profile(docs).count() == 2
    assert dedup.jaccard_pairs(docs).count() == 0
    assert {r.doc_id for r in dedup.exact_dedupe(docs).collect()} == {1, 2}


def test_sketch_family_empty(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import sketches

    ev = _empty_events(spark)
    assert sketches.cms_build(ev, "user_id").count() == 0
    assert sketches.kmv_build(ev, "user_id", group_cols=["event_type"]).count() == 0
    hll = sketches.hll_build(ev, "user_id", group_cols=["event_type"])
    assert hll.count() == 0
    assert sketches.hll_estimate(hll, group_cols=["event_type"]).count() == 0
    sk = sketches.kmv_build(ev, "user_id", group_cols=["event_type"], k=8)
    assert sketches.kmv_intersect_estimate(sk, ["event_type"], k=8).count() == 0
    assert sketches.hll_merge(hll, group_cols=["event_type"]).count() == 0
    hdr = sketches.hdr_build(ev, "user_id", group_cols=["event_type"])
    assert hdr.count() == 0
    assert sketches.hdr_quantile(hdr, [50, 99], group_cols=["event_type"]).count() == 0
    # join-size estimate over empty sides: one defined zero row
    jz = sketches.kmv_join_size(ev, ev, "user_id").collect()
    assert len(jz) == 1 and jz[0].join_rows_est == 0.0 and jz[0].n_shared_sampled == 0
    bloom = sketches.bloom_build(ev, "user_id")
    assert bloom.count() == 0
    # an empty bloom rejects everything: pruning a live probe yields 0 rows
    probe = spark.range(10).select(F.col("id").alias("user_id"))
    assert sketches.bloom_prune(probe, bloom, "user_id").count() == 0


def test_drift_trend_boilerplate_empty(spark):
    ev = _empty_events(spark)
    assert analytics.cusum_drift(ev, "value", "ts", ["event_type"]).count() == 0
    assert analytics.grouped_trend(ev, "value", "ts", ["event_type"]).count() == 0
    assert dedup.boilerplate_ngrams(_empty_docs(spark)).count() == 0


def test_ivf_empty_sides(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    live = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    cb = similarity.centroid_codebook(2, 2, seed=7)
    # empty corpus: nothing to score against
    assert similarity.ivf_topk(live, emb, k=3, codebook=cb).count() == 0
    # empty probe set: no queries, no rows
    assert similarity.ivf_topk(emb, live, k=3, codebook=cb).count() == 0
