"""Sketch aggregates — error-bound tests against exact answers (these stay
out of the oracle gate: DuckDB's approx sketches are different algorithms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_twitter_big_data_pipeline_spark.operators import sketches


def test_approx_distinct_within_rsd(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 1337).alias("v")
    )
    exact = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    approx = {r.g: r.approx_distinct for r in sketches.approx_distinct(df, "v", ["g"]).collect()}
    assert set(approx) == set(exact)
    for g, est in approx.items():
        assert abs(est - exact[g]) / exact[g] < 0.10  # 5× the 2% target rsd


def test_approx_distinct_global(spark):
    df = spark.range(10_000).select((F.col("id") % 777).alias("v"))
    est = sketches.approx_distinct(df, "v").collect()[0].approx_distinct
    assert abs(est - 777) / 777 < 0.10


def test_approx_quantiles_bounds(spark):
    df = spark.range(10_001).select(F.col("id").alias("v"))  # uniform 0..10000
    (row,) = sketches.approx_quantiles(df, "v", [0.5, 0.95]).collect()
    q50, q95 = row.quantiles
    assert abs(q50 - 5000) <= 10  # rank error 1/accuracy = 1e-4 of 10k rows
    assert abs(q95 - 9500) <= 10


def test_approx_quantiles_grouped(spark):
    df = spark.range(2_000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") / 2).cast("long").alias("v")
    )
    out = {r.g: r.quantiles for r in sketches.approx_quantiles(df, "v", [0.5], ["g"]).collect()}
    assert set(out) == {0, 1}
    for q in out.values():
        assert abs(q[0] - 500) <= 5


def test_heavy_hitters_exact_on_full_sample(spark):
    # zipf-ish: value k appears 1000//(k+1) times
    rows = [(k,) for k in range(50) for _ in range(1000 // (k + 1))]
    df = spark.createDataFrame(rows, ["v"])
    out = [(r.value, r.freq) for r in sketches.heavy_hitters(df, "v", n=3, sample_fraction=1.0).collect()]
    assert out == [(0, 1000), (1, 500), (2, 333)]


def test_heavy_hitters_sampled_finds_dominant(spark):
    rows = [("hot",)] * 5000 + [(f"cold{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, ["v"]).repartition(8)
    out = sketches.heavy_hitters(df, "v", n=1, sample_fraction=0.2).collect()
    assert out[0].value == "hot" and out[0].freq == 5000  # freq EXACT despite sampling


def test_heavy_hitters_ignores_nulls(spark):
    rows = [(None,)] * 50 + [("a",)] * 10 + [("b",)] * 5
    df = spark.createDataFrame(rows, "v string")
    out = [(r.value, r.freq) for r in sketches.heavy_hitters(df, "v", n=2, sample_fraction=1.0).collect()]
    assert out == [("a", 10), ("b", 5)]  # null excluded by contract


# ---------------------------------------------------------------- CMS


def test_cms_never_undercounts_and_wide_is_exact(spark):
    from collections import Counter

    vals = [str(i % 7) for i in range(100)] + ["x"] * 13
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    exact = Counter(vals)
    probes = spark.createDataFrame([(v,) for v in set(vals)] + [("absent",)], ["v"])

    # narrow sketch: collisions abound, but the estimate NEVER undercounts
    sk = sketches.cms_build(df, "v", depth=3, width=4)
    est = {
        r.value: r.cms_count
        for r in sketches.cms_estimate(sk, probes, "v", depth=3, width=4).collect()
    }
    for v, c in exact.items():
        assert est[v] >= c

    # wide sketch over 8 distinct values: no collisions -> exact counts,
    # and a value never inserted reads 0 (definitively absent)
    sk2 = sketches.cms_build(df, "v", depth=4, width=4096)
    est2 = {
        r.value: r.cms_count
        for r in sketches.cms_estimate(sk2, probes, "v", depth=4, width=4096).collect()
    }
    for v, c in exact.items():
        assert est2[v] == c
    assert est2["absent"] == 0


def test_cms_state_is_bounded_and_mergeable(spark):
    a = spark.createDataFrame([(str(i % 5),) for i in range(40)], ["v"])
    b = spark.createDataFrame([(str(i % 3),) for i in range(30)], ["v"])
    probes = spark.createDataFrame([(str(i),) for i in range(5)], ["v"])
    kw = dict(depth=4, width=64)

    sk_a = sketches.cms_build(a, "v", **kw)
    assert sk_a.count() <= 4 * 64  # fixed-size state regardless of input rows

    # merge(sketch(a), sketch(b)) == sketch(a ∪ b), counter for counter
    merged = sketches.cms_merge(sk_a, sketches.cms_build(b, "v", **kw))
    direct = sketches.cms_build(a.unionByName(b), "v", **kw)
    em = {
        r.value: r.cms_count
        for r in sketches.cms_estimate(merged, probes, "v", **kw).collect()
    }
    ed = {
        r.value: r.cms_count
        for r in sketches.cms_estimate(direct, probes, "v", **kw).collect()
    }
    assert em == ed


def test_cms_ignores_nulls(spark):
    df = spark.createDataFrame([(None,)] * 20 + [("a",)] * 3, "v string")
    sk = sketches.cms_build(df, "v", depth=2, width=32)
    probes = spark.createDataFrame([("a",), ("b",)], ["v"])
    est = {
        r.value: r.cms_count
        for r in sketches.cms_estimate(sk, probes, "v", depth=2, width=32).collect()
    }
    assert est["a"] == 3
    # total mass inserted is 3 (nulls dropped), so any collision-driven
    # overcount on an absent probe is still bounded by it
    assert 0 <= est["b"] <= 3


# ---------------------------------------------------------------- KMV


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    # 30 distinct values with k=64 -> the sketch IS the distinct set and
    # the estimate is exact
    small = spark.createDataFrame([(str(i % 30),) for i in range(200)], ["v"])
    sk = sketches.kmv_build(small, "v", k=64)
    assert sk.count() == 30
    (row,) = sketches.kmv_estimate(sk, k=64).collect()
    assert row.n_distinct_est == 30.0

    # 5000 distinct values with k=256 -> ~1/sqrt(k) ≈ 6% relative error;
    # md5 is deterministic so this is a fixed number, bounded generously
    big = spark.createDataFrame([(str(i),) for i in range(5000)], ["v"])
    sk2 = sketches.kmv_build(big, "v", k=256)
    assert sk2.count() == 256  # fixed-size state
    (row2,) = sketches.kmv_estimate(sk2, k=256).collect()
    assert abs(row2.n_distinct_est - 5000) / 5000 < 0.25


def test_kmv_grouped_and_merge_equals_concat(spark):
    rows_a = [("g1", str(i)) for i in range(100)] + [("g2", str(i)) for i in range(10)]
    rows_b = [("g1", str(i)) for i in range(50, 150)]  # overlaps g1 by 50
    a = spark.createDataFrame(rows_a, ["g", "v"])
    b = spark.createDataFrame(rows_b, ["g", "v"])
    kw = dict(group_cols=["g"], k=32)

    merged = sketches.kmv_merge(
        sketches.kmv_build(a, "v", **kw), sketches.kmv_build(b, "v", **kw), k=32,
        group_cols=["g"],
    )
    direct = sketches.kmv_build(a.unionByName(b), "v", **kw)
    assert {(r.g, r.hash) for r in merged.collect()} == {
        (r.g, r.hash) for r in direct.collect()
    }
    # g2 never filled its slots -> exact count survives the merge
    est = {
        r.g: r.n_distinct_est
        for r in sketches.kmv_estimate(merged, k=32, group_cols=["g"]).collect()
    }
    assert est["g2"] == 10.0


def _py_hll(values, b=6, salt="hll:"):
    """Pure-Python HLL reference mirroring the md5 seam bit-for-bit."""
    import hashlib
    import math

    m = 1 << b
    tail = 60 - b
    regs = {}
    for v in set(str(x) for x in values):
        h = int(hashlib.md5((salt + v).encode()).hexdigest()[:15], 16)
        bucket, w = h >> tail, h & ((1 << tail) - 1)
        rho = (tail + 1 - w.bit_length()) if w > 0 else tail + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    scale = 61 - b
    s = sum(1 << (scale - r) for r in regs.values()) + (m - len(regs)) * (1 << scale)
    alpha = sketches._hll_alpha(m)
    raw = (alpha * m * m * float(1 << scale)) / float(s)
    zeros = m - len(regs)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def test_hll_matches_python_reference_and_error_bound(spark):
    df = spark.range(30_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % ((F.col("id") % 3) * 400 + 200)).alias("v"),
    )
    exact = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    sk = sketches.hll_build(df, "v", ["g"], b=6)
    est = {r.g: r.n_distinct_est for r in sketches.hll_estimate(sk, b=6, group_cols=["g"]).collect()}
    rows = {r.g: list(df.filter(F.col("g") == r.g).select("v").toPandas()["v"]) for r in df.select("g").distinct().collect()}
    for g, e in est.items():
        assert e == _py_hll(rows[g], b=6), g  # bit-exact vs the reference
        assert abs(e - exact[g]) / exact[g] < 0.35  # ~1.04/sqrt(64) ≈ 13% rsd, 2.7σ slack


def test_hll_small_group_linear_counting_branch(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    est = sketches.hll_estimate(sketches.hll_build(df, "v", b=6), b=6).collect()[0].n_distinct_est
    assert est == _py_hll(range(10), b=6)
    assert abs(est - 10) <= 2  # linear counting is near-exact here


def test_hll_state_bounded_and_merge_equals_concat(spark):
    a = spark.range(5_000).select((F.col("id") % 900).alias("v"))
    c = spark.range(5_000, 9_000).select((F.col("id") % 1100).alias("v"))
    sa, sc = sketches.hll_build(a, "v", b=6), sketches.hll_build(c, "v", b=6)
    assert sa.count() <= 64 and sc.count() <= 64
    merged = sketches.hll_merge(sa, sc)
    both = sketches.hll_build(a.unionByName(c), "v", b=6)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, both.collect()))


def test_hll_rollup_rekeyed_merge_equals_coarse_build(spark):
    """The continuous-aggregate contract behind x_hll_rollup: build fine-
    grained (hour-keyed) sketches, re-key them to the coarse (day) group,
    merge — registers AND estimates equal a direct coarse-keyed build."""
    rows = spark.range(4_000).select(
        (F.col("id") % 5).alias("day"),
        (F.col("id") % 40).alias("hr"),
        (F.col("id") % 700).alias("v"),
    )
    fine = sketches.hll_build(rows, "v", group_cols=["day", "hr"], b=6)
    rolled = sketches.hll_merge(fine.select("day", "bucket", "rho"), group_cols=["day"])
    direct = sketches.hll_build(rows, "v", group_cols=["day"], b=6)
    assert sorted(map(tuple, rolled.collect())) == sorted(map(tuple, direct.collect()))
    e_rolled = sketches.hll_estimate(rolled, b=6, group_cols=["day"])
    e_direct = sketches.hll_estimate(direct, b=6, group_cols=["day"])
    assert sorted(map(tuple, e_rolled.collect())) == sorted(map(tuple, e_direct.collect()))


def test_hdr_quantile_error_bound_and_exact_small_values(spark):
    """est is a data lower bound within the 2^-(p-1) relative budget at
    every percentile, and values under 2^p bits are EXACT."""
    import random

    rng = random.Random(11)
    vals = [rng.randrange(1, 1 << 26) for _ in range(5_000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    sk = sketches.hdr_build(df, "x", precision_bits=6)
    got = {r.pct: r.est for r in sketches.hdr_quantile(sk, [50, 95, 99]).collect()}
    s = sorted(vals)
    for pct in (50, 95, 99):
        exact = s[(len(s) * pct + 99) // 100 - 1]  # rank-th value, 1-based
        est = got[pct]
        assert est <= exact, (pct, est, exact)
        assert exact - est <= max(0, est >> 5), (pct, est, exact)  # width ≤ lo/2^5

    small = spark.createDataFrame([(v,) for v in range(1, 60)], ["x"])
    sk_small = sketches.hdr_build(small, "x", precision_bits=6)
    got_small = {r.pct: r.est for r in sketches.hdr_quantile(sk_small, [50, 99]).collect()}
    ss = list(range(1, 60))
    for pct in (50, 99):
        assert got_small[pct] == ss[(len(ss) * pct + 99) // 100 - 1]  # < 2^6: exact


def test_hdr_state_bounded_merge_equals_concat_and_drops_negatives(spark):
    a = spark.range(20_000).select((F.col("id") * 37 % 100_000).alias("x"))
    c = spark.range(20_000).select((F.col("id") * 101 % 1_000_000).alias("x"))
    sa, sc = sketches.hdr_build(a, "x"), sketches.hdr_build(c, "x")
    # state bound: (64-p+1)·2^(p-1) + 2^p at p=6 -> ≤ 1952 buckets
    assert sa.count() <= 1952 and sc.count() <= 1952
    merged = sketches.hdr_merge(sa, sc)
    both = sketches.hdr_build(a.unionByName(c), "x")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, both.collect()))
    # negatives and nulls drop; non-negatives keep their counts
    signed = spark.createDataFrame([(-5,), (None,), (3,), (3,)], "x long")
    sk = sketches.hdr_build(signed, "x")
    assert [(r.lo, r.cnt) for r in sk.collect()] == [(3, 2)]


def test_kmv_join_size_exact_under_k_and_sampled_above(spark):
    # two-sided, both under k: estimate == true join output size EXACTLY
    a = spark.range(200).select((F.col("id") % 40).alias("ka"))        # 5 rows/key
    b = spark.range(120).select((F.col("id") % 60).alias("kb"))        # 2 rows/key
    est = sketches.kmv_join_size(a, b, "ka", "kb", k=512).collect()[0]
    true_n = a.join(b, a["ka"] == b["kb"]).count()
    assert est.join_rows_est == float(true_n) and true_n == 40 * 5 * 2
    assert est.n_shared_sampled == 40

    # self-join Σ cnt² exact under k
    s = sketches.kmv_join_size(a, a, "ka", k=512).collect()[0]
    assert s.join_rows_est == float(40 * 5 * 5)

    # sampled branch (keys ≫ k): within 30% of the true self-join size
    big = spark.range(60_000).select((F.col("id") % 3_000).alias("k"))  # 20 rows/key
    e = sketches.kmv_join_size(big, big, "k", k=256).collect()[0]
    true_big = 3_000 * 20 * 20
    assert abs(e.join_rows_est - true_big) / true_big < 0.30
    assert e.n_shared_sampled <= 256

    # disjoint key sets: a defined zero estimate, still one row
    d = spark.range(50).select((F.col("id") + 10_000).alias("kb"))
    z = sketches.kmv_join_size(a, d, "ka", "kb", k=512).collect()
    assert len(z) == 1 and z[0].join_rows_est == 0.0 and z[0].n_shared_sampled == 0


def test_kmv_intersect_exact_when_exhaustive_and_bounded_above_k(spark):
    # Two groups sharing exactly 120 of 200/250 values, k large enough to
    # hold both exhaustively -> theta = full span -> estimate is EXACT.
    a = spark.range(200).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(80, 330).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    df = a.unionByName(b)
    sk = sketches.kmv_build(df, "v", ["g"], k=512)
    est = sketches.kmv_intersect_estimate(sk, ["g"], k=512).collect()
    assert len(est) == 1
    assert est[0].g_a == "a" and est[0].g_b == "b"
    assert est[0].n_common_est == 120.0

    # Above k: estimate within 30% of the true 2000-element overlap.
    big_a = spark.range(6_000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    big_b = spark.range(4_000, 9_000).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    sk2 = sketches.kmv_build(big_a.unionByName(big_b), "v", ["g"], k=256)
    e2 = sketches.kmv_intersect_estimate(sk2, ["g"], k=256).collect()[0].n_common_est
    assert abs(e2 - 2000) / 2000 < 0.30


def test_bloom_no_false_negatives_and_prunes(spark):
    build = spark.range(50).select((F.col("id") * 7).alias("k"))
    bloom = sketches.bloom_build(build, "k", m_bits=4096, k_hashes=3)
    # state bounded: at most m/64 words, each a long
    assert bloom.count() <= 4096 // 64

    # every build key survives the prune (no false negatives — guaranteed)
    kept_true = sketches.bloom_prune(build, bloom, "k", m_bits=4096, k_hashes=3)
    assert kept_true.count() == 50

    # a disjoint probe set is mostly dropped (fpp at n=50,m=4096,k=3 ≈ 1e-3)
    probe = spark.range(10_000, 12_000).select(F.col("id").alias("k"))
    survivors = sketches.bloom_prune(probe, bloom, "k", m_bits=4096, k_hashes=3)
    assert survivors.count() <= 20  # 1% of 2000, 10× the expected fpp

    # deterministic: rebuilding yields the identical word/bits frame
    again = sketches.bloom_build(build, "k", m_bits=4096, k_hashes=3)
    assert sorted(map(tuple, bloom.collect())) == sorted(map(tuple, again.collect()))


def test_bloom_prune_then_exact_join_equals_plain_join(spark):
    build = spark.range(30).select((F.col("id") * 13 + 5).alias("k"), F.lit("d").alias("tag"))
    probe = spark.range(2_000).select((F.col("id") % 600).alias("k"), F.col("id").alias("payload"))
    bloom = sketches.bloom_build(build, "k", m_bits=2048, k_hashes=3)
    pruned = sketches.bloom_prune(probe, bloom, "k", m_bits=2048, k_hashes=3)
    via_bloom = pruned.join(build, "k").select("k", "payload")
    plain = probe.join(build, "k").select("k", "payload")
    assert sorted(map(tuple, via_bloom.collect())) == sorted(map(tuple, plain.collect()))
