"""Tests for operators.layout — Z-order clustering keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_twitter_big_data_pipeline_spark.operators import layout


def _morton(xs: list[int], bits: int) -> int:
    out = 0
    n = len(xs)
    for d, x in enumerate(xs):
        for i in range(bits):
            out |= ((x >> i) & 1) << (i * n + d)
    return out


def test_zorder_key_matches_python_reference(spark):
    import random

    rng = random.Random(3)
    rows = [(i, rng.randrange(1000), rng.randrange(1 << 20)) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    bounds = {"x": (0, 1023), "y": (0, (1 << 20) - 1)}
    got = {
        r.id: r.zkey
        for r in layout.zorder_key(df, ["x", "y"], bits=8, bounds=bounds).collect()
    }
    # reference: same shift-bucketing (drop low bits of the span) then morton
    sx = (1023).bit_length() - 8
    sy = ((1 << 20) - 1).bit_length() - 8
    for i, x, y in rows:
        assert got[i] == _morton([x >> sx, y >> sy], 8)


def test_zorder_key_computes_bounds_and_clamps(spark):
    df = spark.createDataFrame([(0, 5, 50), (1, 10, 100), (2, 20, 200)], ["id", "x", "y"])
    # bounds computed from data: min subtracted, so the smallest row keys to 0
    got = {r.id: r.zkey for r in layout.zorder_key(df, ["x", "y"], bits=4).collect()}
    assert got[0] == 0
    # out-of-bounds probes clamp instead of corrupting high bits
    probe = spark.createDataFrame([(9, -100, 10**9)], ["id", "x", "y"])
    (r,) = layout.zorder_key(
        probe, ["x", "y"], bits=4, bounds={"x": (0, 15), "y": (0, 15)}
    ).collect()
    assert r.zkey == _morton([0, 15], 4)


def test_zorder_key_rejects_long_overflow(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], ["a", "b", "c", "d"])
    with pytest.raises(ValueError, match="exceeds"):
        layout.zorder_key(df, ["a", "b", "c", "d"], bits=16)


def test_zorder_layout_prunes_on_the_second_dimension(spark):
    # a 32x32 uniform grid split into 16 files. Lexicographic (x, y) range
    # partitioning makes thin 2x32 slabs — every file's y-envelope spans the
    # FULL y range, so a y predicate prunes nothing. Z-order makes 8x8
    # blocks: same envelope AREA, but a y ∈ [0, 3] predicate intersects only
    # the bottom row of blocks.
    rows = [(x * 32 + y, x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["id", "x", "y"]).repartition(8)
    bounds = {"x": (0, 31), "y": (0, 31)}

    def files_surviving_y_predicate(frame, y_lo, y_hi):
        parts = [p for p in frame.rdd.glom().collect() if p]
        return sum(
            1
            for p in parts
            if min(r.y for r in p) <= y_hi and max(r.y for r in p) >= y_lo
        ), len(parts)

    zordered = layout.zorder_layout(df, ["x", "y"], n_partitions=16, bits=5, bounds=bounds)
    xsorted = df.repartitionByRange(16, "x", "y")
    z_hit, z_total = files_surviving_y_predicate(zordered, 0, 3)
    x_hit, x_total = files_surviving_y_predicate(xsorted, 0, 3)
    assert x_hit == x_total  # lexicographic layout: zero pruning on y
    assert z_hit <= z_total // 2  # z-order: most files' y-envelope misses
    # and the layout drops the key column but keeps every data column/row
    assert zordered.columns == ["id", "x", "y"]
    assert zordered.count() == 32 * 32


def test_file_stats_and_pruned_read_roundtrip(spark, tmp_path):
    # z-ordered write -> stats index -> pruned read: fewer files touched,
    # identical rows to the full-scan filter
    path = str(tmp_path / "grid")
    rows = [(x * 32 + y, x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    layout.zorder_layout(
        df, ["x", "y"], n_partitions=16, bits=5, bounds={"x": (0, 31), "y": (0, 31)}
    ).write.mode("overwrite").parquet(path)

    stats = layout.file_stats(spark, path, ["x", "y"])
    n_files = stats.count()
    assert n_files >= 8  # the range partitioning actually spread the data
    assert stats.agg({"n_rows": "sum"}).collect()[0][0] == 32 * 32

    pred = {"y": (0, 3)}
    pruned = layout.pruned_read(spark, path, pred, stats=stats)
    expected = sorted(
        (r.id, r.x, r.y)
        for r in spark.read.parquet(path).filter("y between 0 and 3").collect()
    )
    assert sorted((r.id, r.x, r.y) for r in pruned.collect()) == expected
    # the index really skips: most files' y-envelope misses [0, 3]
    surviving = stats.filter((F.col("max_y") >= 0) & (F.col("min_y") <= 3)).count()
    assert surviving <= n_files // 2
    # a predicate outside every envelope reads nothing but keeps the schema
    empty = layout.pruned_read(spark, path, {"y": (100, 200)}, stats=stats)
    assert empty.count() == 0
    assert set(["id", "x", "y"]).issubset(set(empty.columns))
