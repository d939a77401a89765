"""Unit tests for functions.enrich — SURVEY §2.4 U1-U3: deterministic
backends, id-based alignment (not positional — the reference's bug), and the
pluggable-backend seam."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from reddit_twitter_big_data_pipeline_spark.functions import enrich


def test_u1_translate_dictionary():
    out = enrich.translate_dictionary(pd.Series(["la guerra es mala", None, "paz"]))
    assert out.tolist() == ["la war es mala", None, "peace"]


def test_u2_sentiment_simplex():
    df = enrich.sentiment_hash(pd.Series(["hello", "", "world"]))
    assert list(df.columns) == ["Positive", "Negative", "Neutral", "Mixed"]
    sums = df.sum(axis=1)
    assert (abs(sums - 1.0) < 1e-9).all()
    # deterministic: same text, same score
    again = enrich.sentiment_hash(pd.Series(["hello"]))
    assert df.iloc[0].tolist() == again.iloc[0].tolist()


def test_u3_claim_keyword_bounds():
    s = enrich.claim_keyword(
        pd.Series(["nothing here", "50 percent killed, officials report", None, ""])
    )
    assert s[0] == 0.0
    assert s[1] == 1.0  # >=3 hits capped at 1.0
    assert s[2] == 0.0 and s[3] == 0.0


def test_enrich_stage_rows_keep_own_scores(spark):
    """Anti-regression for the reference's positional-alignment bug
    (glue/reddit_glue.py:169-180) and loop-variable leak (:122-124): with 26
    rows (one over the 25 batch), every row must carry the score of ITS OWN
    text."""
    rows = [(str(i), f"text number {i} " + ("percent" if i % 2 else "")) for i in range(26)]
    df = spark.createDataFrame(rows, ["id", "content"])
    out = enrich.enrich(df).select("id", "content", "Positive", "claimScore").collect()
    assert len(out) == 26
    exp_sent = {
        r.id: enrich.sentiment_hash(pd.Series([r.content]))["Positive"].iloc[0] for r in out
    }
    exp_claim = {r.id: enrich.claim_keyword(pd.Series([r.content])).iloc[0] for r in out}
    for r in out:
        assert abs(r.Positive - exp_sent[r.id]) < 1e-12, r.id
        assert abs(r.claimScore - exp_claim[r.id]) < 1e-12, r.id


def test_backend_seam_swappable(spark):
    orig = enrich.BACKENDS["claim"]
    try:
        enrich.set_backend("claim", lambda texts: pd.Series([0.42] * len(texts), index=texts.index))
        df = spark.createDataFrame([("1", "anything")], ["id", "content"])
        out = df.select(enrich.claim_udf()(F.col("content")).alias("c")).first()
        assert out.c == 0.42
    finally:
        enrich.set_backend("claim", orig)
