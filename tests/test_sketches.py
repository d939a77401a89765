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
