"""Gopher-style quality signals, benchmark decontamination, and SemDeDup
cluster-verified embedding dedup (round-2 LLM-pipeline additions)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from reddit_twitter_big_data_pipeline_spark.operators import dedup, similarity, text


# --- quality signals --------------------------------------------------------


def _signals(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.quality_signals(df, min_stop_hits=1)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_quality_signals_values(spark):
    good = " ".join(
        ["the quick brown fox jumps over lazy dogs near river banks"] * 6
    )  # 11 words x6 = 66, 'the' x6
    sig = _signals(
        spark,
        [
            (1, good),
            (2, "tiny doc"),  # too short
            (3, " ".join(["spam"] * 80)),  # one word repeated
        ],
    )
    s1 = sig[1]
    assert s1["n_words"] == 66
    assert s1["stop_hits"] == 1
    assert s1["keep"] is True
    assert s1["top_word_frac"] == pytest.approx(6 / 66, abs=1e-6)
    # 11 distinct words repeated 6x
    assert s1["type_token_ratio"] == pytest.approx(11 / 66, abs=1e-6)

    assert sig[2]["n_words"] == 2
    assert sig[2]["keep"] is False

    s3 = sig[3]
    assert s3["top_word_frac"] == pytest.approx(1.0)
    assert s3["type_token_ratio"] == pytest.approx(1 / 80, abs=1e-6)
    assert s3["keep"] is False  # repetition + no stopwords


def test_ngram_dup_fraction(spark):
    sig = _signals(
        spark,
        [
            (1, "a b a b a b"),   # 2-grams: ab ba ab ba ab → 2 distinct of 5
            (2, "w x y z"),        # all 2-grams distinct
            (3, "solo"),           # shorter than n → one whole-text gram
        ],
    )
    assert sig[1]["dup_2gram_frac"] == pytest.approx(1 - 2 / 5, abs=1e-6)
    # 3-grams: aba bab aba bab → 2 distinct of 4
    assert sig[1]["dup_3gram_frac"] == pytest.approx(1 - 2 / 4, abs=1e-6)
    assert sig[2]["dup_2gram_frac"] == 0.0
    assert sig[3]["dup_2gram_frac"] == 0.0
    assert sig[3]["dup_3gram_frac"] == 0.0


def test_quality_signals_mean_word_len_and_alpha(spark):
    sig = _signals(spark, [(1, "aa bbbb cc dddd"), (2, "12 34 56 78 90")])
    assert sig[1]["mean_word_len"] == pytest.approx(3.0)
    assert sig[1]["alpha_word_frac"] == pytest.approx(1.0)
    assert sig[2]["alpha_word_frac"] == pytest.approx(0.0)
    assert sig[2]["keep"] is False


def test_max_word_frac_single_token(spark):
    sig = _signals(spark, [(1, "solo")])
    assert sig[1]["top_word_frac"] == pytest.approx(1.0)
    assert sig[1]["n_words"] == 1


def test_gopher_keep_published_default_requires_two_stopwords(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["the quick brown fox jumps over lazy dogs again today"] * 6))],
        "doc_id long, text string",
    )
    # only 'the' present -> fails the published >=2 rule
    out = df.select(text.gopher_keep("text").alias("k")).collect()
    assert out[0]["k"] is False


# --- decontamination --------------------------------------------------------


def test_contamination_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 5-gram "beta gamma delta epsilon zeta"
            (1, "prefix words beta gamma delta epsilon zeta suffix tail"),
            (2, "completely different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.contamination_flags(corpus, bench, k=5).collect()
    }
    assert out[1]["contaminated"] is True
    assert out[1]["n_contaminated"] >= 1
    assert out[2]["contaminated"] is False
    assert out[2]["n_contaminated"] == 0


def test_contamination_flags_k8_misses_short_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        # shares only a 5-token run; no 8-token shingle can match
        [(1, "one two beta gamma delta epsilon zeta nine ten eleven")],
        "doc_id long, text string",
    )
    out = dedup.contamination_flags(corpus, bench, k=8).collect()
    assert out[0]["contaminated"] is False


# --- SemDeDup ---------------------------------------------------------------


def _emb_df(spark, mat, ids=None):
    rows = [
        (int(i if ids is None else ids[j]), [float(x) for x in row])
        for j, (i, row) in enumerate(zip(range(len(mat)), mat))
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_recovers_planted_copies(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(60, 16))
    # plant 5 exact copies with offset ids
    mat = np.vstack([base, base[:5]])
    ids = list(range(60)) + [1000 + i for i in range(5)]
    df = _emb_df(spark, mat, ids)
    pairs = similarity.semantic_dedup_pairs(
        df, threshold=0.95, n_clusters=8, n_assign=2, seed=42
    ).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    for i in range(5):
        assert (i, 1000 + i) in found
    for r in pairs:
        assert r["cosine"] >= 0.95


def test_semantic_dedup_no_false_pairs_on_random(spark):
    rng = np.random.default_rng(11)
    # random gaussian 16-dim: no pair reaches cosine 0.95
    df = _emb_df(spark, rng.normal(size=(50, 16)))
    assert similarity.semantic_dedup_pairs(df, n_clusters=4).count() == 0


def test_semantic_dedup_matches_lsh_variant_on_testdata(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    copy = emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    both = emb.unionByName(copy)
    sem = {
        (r["a"], r["b"])
        for r in similarity.semantic_dedup_pairs(both, threshold=0.95).collect()
    }
    lsh = {
        (r["a"], r["b"])
        for r in similarity.embedding_near_dup_pairs(both, threshold=0.95).collect()
    }
    assert sem == lsh and len(sem) > 0


# --- edit-distance pairs ----------------------------------------------------


def test_edit_distance_pairs_exact_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "kitten"),
            (2, "sitten"),   # substitution: distance 1
            (3, "kittens"),  # insertion: distance 1
            (4, "kiten"),    # deletion: distance 1
            (5, "mitten"),   # distance 1 from kitten, 1 from sitten
            (6, "banana"),   # unrelated
            (7, "abcd"),
            (8, "bacd"),     # transposition: distance 2 — must NOT pair
        ],
        "doc_id long, text string",
    )
    pairs = {(r["a"], r["b"]): r["distance"] for r in dedup.edit_distance_pairs(df).collect()}
    assert pairs[(1, 2)] == 1 and pairs[(1, 3)] == 1 and pairs[(1, 4)] == 1
    assert pairs[(1, 5)] == 1 and pairs[(2, 5)] == 1
    assert (7, 8) not in pairs  # transposition is distance 2
    assert all(a != 6 and b != 6 for a, b in pairs)
    # exact duplicates pair at distance 0
    df2 = spark.createDataFrame([(1, "same"), (2, "same")], "doc_id long, text string")
    out = dedup.edit_distance_pairs(df2).collect()
    assert len(out) == 1 and out[0]["distance"] == 0


def test_edit_distance_pairs_matches_bruteforce_oracle(spark, sf_dir):
    import duckdb

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = {
        (r["a"], r["b"]): r["distance"]
        for r in dedup.edit_distance_pairs(cust, "c_custkey", "c_name").collect()
    }
    want = {
        (a, b): d
        for a, b, d in duckdb.sql(
            f"""SELECT a.c_custkey, b.c_custkey, levenshtein(a.c_name, b.c_name)
                FROM '{sf_dir}/customer.parquet' a
                JOIN '{sf_dir}/customer.parquet' b ON a.c_custkey < b.c_custkey
                WHERE levenshtein(a.c_name, b.c_name) <= 1"""
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_equidepth_histogram_depth_and_bounds(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    # 100 rows incl. a heavy tie block: buckets stay equal-depth and the
    # (value, key) total order makes tie placement deterministic
    rows = [(i, float(min(i, 60))) for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = analytics.equidepth_histogram(df, "v", tie_cols=["k"], n_buckets=10).collect()
    assert [r.bucket for r in out] == list(range(1, 11))
    assert all(r.n_rows == 10 for r in out)  # 100/10, exact
    # bucket bounds tile the sorted order: each lo >= previous hi
    for a, b in zip(out, out[1:]):
        assert b.lo >= a.hi
    # the tie block (v=60, keys 60..99) fills exactly the last 4 buckets
    assert all(out[i].lo == 60.0 and out[i].hi == 60.0 for i in (6, 7, 8, 9))


def test_equidepth_histogram_remainder_to_first_buckets(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    df = spark.createDataFrame([(i, float(i)) for i in range(7)], ["k", "v"])
    out = analytics.equidepth_histogram(df, "v", tie_cols=["k"], n_buckets=3).collect()
    assert [(r.bucket, r.n_rows) for r in out] == [(1, 3), (2, 2), (3, 2)]


def test_global_rank_matches_sorted_order_across_partitions(spark):
    import random

    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    rng = random.Random(5)
    rows = [(i, rng.randrange(50)) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(13)
    ranked = {r.k: r.rank for r in analytics.global_rank(df, ["v", "k"]).collect()}
    expect = {
        k: i + 1
        for i, (k, _v) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert ranked == expect


def test_psi_drift_detects_shift_and_smooths_empty_buckets(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    base = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], ["k", "v"]
    )
    # identical distribution -> PSI ~ 0 (smoothing keeps it finite, tiny)
    same = base.select("v")
    out = analytics.psi_drift(base, same, "v", tie_cols=["k"], n_buckets=10).collect()
    assert len(out) == 10
    assert abs(sum(r.psi_contrib for r in out)) < 0.01
    assert [r.bucket for r in out] == list(range(1, 11))
    assert all(r.n_base == 100 for r in out)  # equi-depth baseline

    # hard shift: current mass all in the top decile; low buckets are EMPTY
    # in current — smoothing keeps every contribution finite
    shifted = spark.createDataFrame([(float(99),)] * 500, ["v"])
    out2 = analytics.psi_drift(base, shifted, "v", tie_cols=["k"], n_buckets=10).collect()
    psi = sum(r.psi_contrib for r in out2)
    assert psi > 1.0  # far past the 0.25 "shifted" rule of thumb
    assert all(r.psi_contrib is not None for r in out2)
    assert {r.bucket: r.n_cur for r in out2}[10] == 500


def test_bigram_logprob_matches_hand_model(spark):
    import math

    from reddit_twitter_big_data_pipeline_spark.operators import text as text_ops

    docs = [(1, "a b a b"), (2, "a a"), (3, "b")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.id: r for r in text_ops.bigram_logprob(df, lam=0.75).collect()}

    # corpus: tokens a×4, b×3, N=7; bigrams: (a,b)x2 (b,a)x1 (a,a)x1
    N = 7.0
    uni = {"a": 4, "b": 3}
    big = {("a", "b"): 2, ("b", "a"): 1, ("a", "a"): 1}

    def p(prev, w):
        if prev is None:
            return uni[w] / N
        return 0.75 * (big.get((prev, w), 0) / uni[prev]) + 0.25 * (uni[w] / N)

    def score(toks):
        lps = [math.log(p(None, toks[0]))] + [
            math.log(p(a, b)) for a, b in zip(toks, toks[1:])
        ]
        return sum(lps) / len(lps)

    for doc_id, textv in docs:
        toks = textv.split()
        assert got[doc_id].n_tokens == len(toks)
        assert abs(got[doc_id].avg_logprob - score(toks)) < 1e-12
        assert abs(got[doc_id].ppl - math.exp(-score(toks))) < 1e-9
    # the repetitive doc (seen bigrams) is more typical than the bare 'b'
    assert got[1].ppl < got[3].ppl


def _py_cusum(series, slack_pct=5, threshold_pct=50, unit=1_000_000):
    """Pure-Python reference: the literal max(0, ...) recursion on the
    same n-scaled exact integers as analytics.cusum_drift."""
    xi = [int(__import__("math").floor(v * unit)) for v in series]
    n, s_total = len(xi), sum(xi)
    slack = (s_total * slack_pct) // 100
    thresh = (s_total * threshold_pct) // 100
    out, s = [], 0
    for x in xi:
        s = max(0, s + n * x - s_total - slack)
        out.append((s, s > thresh))
    return out


def test_cusum_matches_recursion_and_detects_planted_shift(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    import datetime

    # 40 stationary days at ~10, then 20 days shifted to ~18
    vals = [10.0 + (i % 3) * 0.5 for i in range(40)] + [
        18.0 + (i % 3) * 0.5 for i in range(20)
    ]
    rows = [
        ("g", datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["g", "ts", "value"])
    got = (
        analytics.cusum_drift(df, "value", "ts", ["g"])
        .orderBy("day")
        .collect()
    )
    ref = _py_cusum(vals)
    assert [(r.cusum, r.flag) for r in got] == ref
    # the recursion resets to 0 through the stationary stretch and the
    # alarm fires inside the shifted window, not before it
    assert all(not r.flag for r in got[:40])
    fired = [i for i, r in enumerate(got) if r.flag]
    assert fired and 40 <= fired[0] < 55


def test_cusum_no_alarm_on_stationary_series(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    import datetime

    rows = [
        ("a", datetime.datetime(2024, 3, 1) + datetime.timedelta(days=i), 5.0 + (i % 5) * 0.1)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["g", "ts", "value"])
    got = analytics.cusum_drift(df, "value", "ts", ["g"]).collect()
    assert not any(r.flag for r in got)
    ref = _py_cusum([5.0 + (i % 5) * 0.1 for i in range(50)])
    assert sorted(r.cusum for r in got) == sorted(s for s, _ in ref)


def test_grouped_trend_recovers_planted_slope(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    import datetime

    # exact line y = 3 + 2.5*x micro-units never lose precision at .5 steps
    rows = [
        ("up", datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i), 3.0 + 2.5 * i)
        for i in range(20)
    ] + [
        ("flat", datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i), 7.25)
        for i in range(15)
    ] + [
        ("single", datetime.datetime(2024, 1, 1), 1.0)
    ]
    df = spark.createDataFrame(rows, ["g", "ts", "value"])
    out = {r.g: r for r in analytics.grouped_trend(df, "value", "ts", ["g"]).collect()}
    assert out["up"].n_days == 20
    assert abs(out["up"].slope - 2.5e6) < 1e-6  # micro-units/day
    assert abs(out["up"].intercept - 3.0e6) < 1e-6
    assert out["flat"].slope == 0.0 and abs(out["flat"].intercept - 7.25e6) < 1e-6
    assert out["single"].slope is None and out["single"].intercept is None


def test_grouped_trend_sums_multiple_rows_per_day(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    import datetime

    # two rows per day summing to the same line -> identical fit
    rows = []
    for i in range(10):
        ts = datetime.datetime(2024, 5, 1) + datetime.timedelta(days=i)
        total = 10.0 + 4.0 * i
        rows += [("g", ts, total * 0.25), ("g", ts + datetime.timedelta(hours=3), total * 0.75)]
    df = spark.createDataFrame(rows, ["g", "ts", "value"])
    (r,) = analytics.grouped_trend(df, "value", "ts", ["g"]).collect()
    assert abs(r.slope - 4.0e6) < 1e-6 and abs(r.intercept - 10.0e6) < 1e-6


def test_grouped_corr_recovers_planted_correlations(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    import datetime

    rows = []
    for i in range(30):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i)
        base = 10.0 + (i % 7)
        rows.append(("a", ts, base))            # reference series
        rows.append(("b", ts, 2.0 * base + 5))  # perfectly correlated
        rows.append(("c", ts, 100.0 - 3 * base))  # perfectly anti-correlated
        rows.append(("d", ts, 42.0))            # constant -> NULL corr
    df = spark.createDataFrame(rows, ["g", "ts", "value"])
    out = {(r.g_a, r.g_b): r for r in analytics.grouped_corr(df, "value", "ts", "g").collect()}
    assert len(out) == 6
    assert abs(out[("a", "b")].corr - 1.0) < 1e-12
    assert abs(out[("a", "c")].corr + 1.0) < 1e-12
    assert abs(out[("b", "c")].corr + 1.0) < 1e-12
    for pair in [("a", "d"), ("b", "d"), ("c", "d")]:
        assert out[pair].corr is None
    assert all(r.n_days == 30 for r in out.values())


def test_grouped_corr_only_common_days(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    import datetime

    rows = [("a", datetime.datetime(2024, 2, 1) + datetime.timedelta(days=i), float(i)) for i in range(10)]
    rows += [("b", datetime.datetime(2024, 2, 6) + datetime.timedelta(days=i), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "ts", "value"])
    (r,) = analytics.grouped_corr(df, "value", "ts", "g").collect()
    assert r.n_days == 5  # overlap Feb 6-10
    assert abs(r.corr - 1.0) < 1e-12  # both linear over the overlap


def test_sessionize_batch_splits_on_gap(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    import datetime

    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        # user 1: three events 10 min apart, then a 2h gap, then two more
        (1, t0, 100),
        (1, t0 + datetime.timedelta(minutes=10), 101),
        (1, t0 + datetime.timedelta(minutes=20), 102),
        (1, t0 + datetime.timedelta(minutes=140), 103),
        (1, t0 + datetime.timedelta(minutes=150), 104),
        # user 2: single event
        (2, t0, 200),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = {
        (r.user, r.session_seq): r
        for r in analytics.sessionize_batch(df, gap_minutes=30).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)].n_events == 3 and out[(1, 1)].duration_us == 20 * 60 * 1_000_000
    assert out[(1, 2)].n_events == 2 and out[(1, 2)].duration_us == 10 * 60 * 1_000_000
    assert out[(2, 1)].n_events == 1 and out[(2, 1)].duration_us == 0
    # a gap of exactly gap_minutes does NOT split (strict >)
    rows3 = [(3, t0, 1), (3, t0 + datetime.timedelta(minutes=30), 2)]
    df3 = spark.createDataFrame(rows3, ["user_id", "ts", "event_id"])
    got3 = analytics.sessionize_batch(df3, gap_minutes=30).collect()
    assert len(got3) == 1 and got3[0].n_events == 2


def test_key_skew_profile_uniform_vs_hot_key(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import analytics

    import math

    # uniform: 100 keys x 10 rows -> norm_entropy == 1, top1_share = 1%
    uni = spark.range(1000).select((F.col("id") % 100).alias("k"))
    (u,) = analytics.key_skew_profile(uni, "k").collect()
    assert u.n_rows == 1000 and u.n_keys == 100
    assert abs(u.entropy - math.log(100)) < 1e-9
    assert abs(u.norm_entropy - 1.0) < 1e-9
    assert u.top1_share == 0.01 and u.topn_share == 0.1

    # degenerate hot key: 90% of mass on one key
    hot = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    (h,) = analytics.key_skew_profile(hot, "k").collect()
    assert h.n_keys == 101 and h.top1_share == 0.9
    assert h.norm_entropy < 0.25 < u.norm_entropy

    # python reference on the hot layout
    counts = [900] + [1] * 100
    n = sum(counts)
    ref_ent = math.log(n) - sum(c * math.log(c) for c in counts) / n
    assert abs(h.entropy - ref_ent) < 1e-9

    # single-key frame: norm_entropy undefined -> NULL, entropy 0
    one = spark.range(50).select(F.lit(7).alias("k"))
    (o,) = analytics.key_skew_profile(one, "k").collect()
    assert abs(o.entropy) < 1e-12 and o.norm_entropy is None and o.top1_share == 1.0
