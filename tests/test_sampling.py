"""Deterministic sampling/split operators."""

from __future__ import annotations

from reddit_twitter_big_data_pipeline_spark.operators import sampling


def _docs(spark, n=2000):
    return spark.createDataFrame([(i, f"doc {i}") for i in range(n)], ["doc_id", "text"])


def test_hash_sample_deterministic_and_sized(spark):
    df = _docs(spark)
    s1 = sorted(r.doc_id for r in sampling.hash_sample(df, 0.1).collect())
    s2 = sorted(r.doc_id for r in sampling.hash_sample(df, 0.1).collect())
    assert s1 == s2                      # same rows every run
    assert 140 <= len(s1) <= 260         # ~10% of 2000
    # repartitioning must not change membership (the df.sample() failure mode)
    s3 = sorted(r.doc_id for r in sampling.hash_sample(df.repartition(7), 0.1).collect())
    assert s1 == s3


def test_hash_sample_salts_decorrelate(spark):
    df = _docs(spark)
    a = {r.doc_id for r in sampling.hash_sample(df, 0.1, salt="a").collect()}
    b = {r.doc_id for r in sampling.hash_sample(df, 0.1, salt="b").collect()}
    # independent 10% samples overlap ~1% (20 rows), not 100%
    assert len(a & b) < len(a) / 2


def test_hash_sample_nested_fractions(spark):
    df = _docs(spark)
    big = {r.doc_id for r in sampling.hash_sample(df, 0.2).collect()}
    small = {r.doc_id for r in sampling.hash_sample(df, 0.1).collect()}
    assert small <= big  # same salt ⇒ fractions nest (bucket < c is monotone)


def test_stratified_sample(spark):
    rows = [(i, "en" if i % 10 else "mi") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.stratified_sample(df, "lang", {"mi": 1.0, "en": 0.05})
    got = [r.lang for r in out.collect()]
    assert got.count("mi") == 100        # rare stratum kept whole
    assert 20 <= got.count("en") <= 80   # ~5% of 900


def test_split_disjoint_exhaustive_stable(spark):
    df = _docs(spark)
    tr, va, te = sampling.split_train_val_test(df, (0.8, 0.1, 0.1))
    tr_ids = {r.doc_id for r in tr.collect()}
    va_ids = {r.doc_id for r in va.collect()}
    te_ids = {r.doc_id for r in te.collect()}
    assert not (tr_ids & va_ids) and not (tr_ids & te_ids) and not (va_ids & te_ids)
    assert len(tr_ids) + len(va_ids) + len(te_ids) == 2000
    # growing the corpus keeps existing rows in their splits
    bigger = _docs(spark, 3000)
    tr2, va2, te2 = sampling.split_train_val_test(bigger, (0.8, 0.1, 0.1))
    assert va_ids <= {r.doc_id for r in va2.collect()}
    assert te_ids <= {r.doc_id for r in te2.collect()}
