"""As-of and range joins — unit cases plus a DuckDB ASOF JOIN differential
oracle run inside the test (these operators stay out of the driver's
queries() registry, so the oracle lives here)."""

from __future__ import annotations

import duckdb
import pandas as pd

from pyspark.sql import functions as F
from reddit_twitter_big_data_pipeline_spark.operators import temporal

EVENTS = [
    # user, ts, action
    (1, 100, "a"), (1, 205, "b"), (1, 310, "c"),
    (2, 150, "d"),
    (3, 50, "e"),            # before any snapshot → null match
]
SNAPSHOTS = [
    # user, ts, score
    (1, 100, 10), (1, 200, 20), (1, 300, 30),
    (2, 100, 77),
]


def _frames(spark):
    ev = spark.createDataFrame(EVENTS, ["user_id", "ts", "action"])
    snap = spark.createDataFrame(SNAPSHOTS, ["user_id", "snap_ts", "score"])
    return ev, snap


def test_as_of_join_backward_semantics(spark):
    ev, snap = _frames(spark)
    out = temporal.as_of_join(ev, snap, ["user_id"], "ts", "snap_ts")
    got = {(r.user_id, r.ts): r.score for r in out.collect()}
    assert got == {
        (1, 100): 10,   # exactly-simultaneous snapshot matches (≤)
        (1, 205): 20,
        (1, 310): 30,
        (2, 150): 77,
        (3, 50): None,  # no snapshot for user 3
    }


def test_as_of_join_matches_duckdb_asof(spark):
    ev, snap = _frames(spark)
    out = temporal.as_of_join(ev, snap, ["user_id"], "ts", "snap_ts")
    spark_rows = sorted(
        (r.user_id, r.ts, r.action, r.score) for r in out.collect()
    )
    con = duckdb.connect()
    con.register("ev", pd.DataFrame(EVENTS, columns=["user_id", "ts", "action"]))
    con.register("snap", pd.DataFrame(SNAPSHOTS, columns=["user_id", "snap_ts", "score"]))
    oracle = con.sql(
        """
        SELECT ev.user_id, ev.ts, ev.action, snap.score
        FROM ev ASOF LEFT JOIN snap
          ON ev.user_id = snap.user_id AND ev.ts >= snap.snap_ts
        ORDER BY 1, 2
        """
    ).fetchall()
    oracle = sorted((u, t, a, s) for (u, t, a, s) in oracle)
    assert spark_rows == oracle


def test_as_of_join_tolerance(spark):
    ev, snap = _frames(spark)
    out = temporal.as_of_join(ev, snap, ["user_id"], "ts", "snap_ts", tolerance_s=10)
    got = {(r.user_id, r.ts): r.score for r in out.collect()}
    # only the exactly-simultaneous and ≤10s-old snapshots survive
    assert got[(1, 100)] == 10 and got[(1, 205)] == 20
    assert got[(1, 310)] == 30  # 310-300 = 10 ≤ 10
    assert got[(2, 150)] is None  # 150-100 = 50 > 10


def test_range_join_buckets(spark):
    pts = spark.createDataFrame(
        [(1, 5, "p1"), (1, 15, "p2"), (1, 25, "p3"), (2, 5, "p4")],
        ["k", "t", "name"],
    )
    ivs = spark.createDataFrame(
        [(1, 0, 10, "early"), (1, 10, 30, "late"), (2, 100, 200, "nope")],
        ["k", "lo", "hi", "label"],
    )
    out = temporal.range_join(pts, ivs, ["k"], "t", "lo", "hi", bucket_width=7)
    got = sorted((r.name, r.label) for r in out.collect())
    assert got == [("p1", "early"), ("p2", "late"), ("p3", "late")]


def test_range_join_boundary_half_open(spark):
    pts = spark.createDataFrame([(1, 10, "edge")], ["k", "t", "name"])
    ivs = spark.createDataFrame(
        [(1, 0, 10, "ends_at_10"), (1, 10, 20, "starts_at_10")], ["k", "lo", "hi", "label"]
    )
    out = temporal.range_join(pts, ivs, ["k"], "t", "lo", "hi", bucket_width=5)
    assert [r.label for r in out.collect()] == ["starts_at_10"]  # [lo, hi)


def test_as_of_join_rejects_colliding_payload(spark):
    import pytest

    ev, snap = _frames(spark)
    snap2 = snap.withColumnRenamed("score", "action")  # collides with left
    with pytest.raises(ValueError, match="collide"):
        temporal.as_of_join(ev, snap2, ["user_id"], "ts", "snap_ts")


def test_range_join_left_preserves_unmatched_points(spark):
    pts = spark.createDataFrame(
        [(1, 50), (1, 250), (2, 10)], ["k", "t"]
    )  # 250 and 10 match nothing
    iv = spark.createDataFrame([(1, 0, 100, "x")], ["k", "s", "e", "tag"])
    out = temporal.range_join(pts, iv, ["k"], "t", "s", "e", bucket_width=100, how="left")
    rows = {(r.k, r.t): r.tag for r in out.collect()}
    assert rows == {(1, 50): "x", (1, 250): None, (2, 10): None}
    assert out.count() == 3


def test_range_join_ignores_inverted_and_empty_intervals(spark):
    pts = spark.createDataFrame([(1, 50)], ["k", "t"])
    iv = spark.createDataFrame(
        # inverted (would fan out to ~1e7 buckets descending without the
        # guard), empty, and one real interval
        [(1, 10_000_000, 0, "bad"), (1, 50, 50, "empty"), (1, 0, 100, "ok")],
        ["k", "s", "e", "tag"],
    )
    out = temporal.range_join(pts, iv, ["k"], "t", "s", "e", bucket_width=100)
    assert [r.tag for r in out.collect()] == ["ok"]


def test_range_join_rejects_outer_hows(spark):
    import pytest

    pts = spark.createDataFrame([(1, 50)], ["k", "t"])
    iv = spark.createDataFrame([(1, 0, 100)], ["k", "s", "e"])
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            temporal.range_join(pts, iv, ["k"], "t", "s", "e", 100, how=how)


def test_as_of_join_null_in_latest_snapshot_stays_null(spark):
    # The fill-forward is atomic per right ROW: a legitimately-NULL field in
    # the newest snapshot must NOT back-fill from an older snapshot (that
    # would emit a composite row that never existed — pandas merge_asof
    # returns the NULL).
    left = spark.createDataFrame([(1, 3)], ["k", "lt"])
    right = spark.createDataFrame(
        [(1, 1, 10.0, 5.0), (1, 2, 20.0, None)], ["k", "rt", "price", "qty"]
    )
    out = temporal.as_of_join(left, right, ["k"], "lt", "rt").collect()[0]
    assert out.price == 20.0 and out.qty is None


def test_as_of_join_tolerance_masks_whole_stale_row(spark):
    # With tolerance, an out-of-window snapshot contributes NOTHING — no
    # field survives from any older row either.
    left = spark.createDataFrame([(1, 100)], ["k", "lt"])
    right = spark.createDataFrame(
        [(1, 10, 1.0, 2.0), (1, 90, 3.0, None)], ["k", "rt", "a", "b"]
    )
    out = temporal.as_of_join(left, right, ["k"], "lt", "rt", tolerance_s=20).collect()[0]
    assert out.a == 3.0 and out.b is None  # in-tolerance row, its own NULL kept
    out2 = temporal.as_of_join(left, right, ["k"], "lt", "rt", tolerance_s=5).collect()[0]
    assert out2.a is None and out2.b is None  # everything stale ⇒ all NULL


def test_resample_ffill_gapfill_and_locf(spark):
    """Grid covers the full span at the step; empty buckets carry the last
    observation forward; grid instants before the first observation are
    null; an observation AT a grid instant is included (inclusive fill)."""
    from reddit_twitter_big_data_pipeline_spark.operators import temporal

    rows = [
        ("m", "2023-01-01 00:20:00", 1.0),   # first obs: 00:00/00:15 null
        ("m", "2023-01-01 00:30:00", 2.0),   # exactly on a grid instant
        # gap: nothing until 01:25 → 00:45..01:15 carry 2.0
        ("m", "2023-01-01 01:25:00", 5.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts_s", "value"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = {
        str(r.grid_ts): r.value
        for r in temporal.resample_ffill(df, "value", keys=["k"]).collect()
    }
    assert out["2023-01-01 00:00:00"] is None
    assert out["2023-01-01 00:15:00"] is None
    assert out["2023-01-01 00:30:00"] == 2.0     # on-grid obs included
    assert out["2023-01-01 00:45:00"] == 2.0     # gap filled forward
    assert out["2023-01-01 01:15:00"] == 2.0
    # grid ends at max(ts)=01:25 → last grid point 01:15; 01:25 itself is
    # not on the 15-min grid
    assert max(out) == "2023-01-01 01:15:00"
    assert len(out) == 6


def test_resample_ffill_same_ts_ties_break_to_max(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import temporal

    rows = [("m", "2023-01-01 00:00:00", 1.0), ("m", "2023-01-01 00:00:00", 9.0)]
    df = spark.createDataFrame(rows, ["k", "ts_s", "value"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = {str(r.grid_ts): r.value
           for r in temporal.resample_ffill(df, "value", keys=["k"]).collect()}
    # two events share the grid instant: deterministic max tie-break
    assert out == {"2023-01-01 00:00:00": 9.0}


def test_resample_ffill_skips_null_observations(spark):
    """locf semantics: a null-valued observation must not clear the carried
    value (last NON-null wins) — pinned because the DuckDB oracle models
    this by excluding null observations from its ASOF source."""
    rows = [
        ("m", "2023-01-01 00:00:00", 1.0),
        ("m", "2023-01-01 00:10:00", None),   # null obs inside the window
        ("m", "2023-01-01 00:30:00", 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts_s string, value double").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = {str(r.grid_ts): r.value
           for r in temporal.resample_ffill(df, "value", keys=["k"]).collect()}
    assert out["2023-01-01 00:00:00"] == 1.0
    assert out["2023-01-01 00:15:00"] == 1.0   # null at 00:10 did not clear it
    assert out["2023-01-01 00:30:00"] == 2.0


def test_as_of_join_forward_direction_and_tolerance(spark):
    """Forward as-of: the EARLIEST right row at-or-after the event; the
    boundary (equal ts) matches inclusively; tolerance drops matches too
    far in the future; unknown direction rejected."""
    import pytest as _pytest

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 400)], ["eid", "k", "t"]
    )
    right = spark.createDataFrame(
        [("u", 205, "a"), ("u", 300, "b")], ["k", "rt", "payload"]
    )
    out = {r.eid: r.payload for r in temporal.as_of_join(
        left, right, ["k"], "t", "rt", direction="forward").collect()}
    assert out == {1: "a", 2: "a", 3: None}  # 2 matches at equal ts; 3 has no later row

    tol = {r.eid: r.payload for r in temporal.as_of_join(
        left, right, ["k"], "t", "rt", direction="forward", tolerance_s=50).collect()}
    assert tol == {1: None, 2: "a", 3: None}  # 205-100=105 > 50 dropped

    with _pytest.raises(ValueError, match="direction"):
        temporal.as_of_join(left, right, ["k"], "t", "rt", direction="sideways")


def test_as_of_join_null_timestamps_never_match(spark):
    """A null-ts LEFT row keeps a null match in BOTH directions (a plain
    desc order sorted nulls last and handed forward-direction rows the
    earliest snapshot); a null-ts RIGHT row never participates at all."""
    left = spark.createDataFrame(
        [(1, "u", 250), (9, "u", None)], "eid long, k string, t long"
    )
    right = spark.createDataFrame(
        [("u", 205, "a"), ("u", 300, "b"), ("u", None, "ghost")],
        "k string, rt long, payload string",
    )
    fwd = {r.eid: r.payload for r in temporal.as_of_join(
        left, right, ["k"], "t", "rt", direction="forward").collect()}
    assert fwd == {1: "b", 9: None}
    bwd = {r.eid: r.payload for r in temporal.as_of_join(
        left, right, ["k"], "t", "rt").collect()}
    assert bwd == {1: "a", 9: None}
