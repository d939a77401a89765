"""tools/bench_compare.py (VERDICT r12 item 5 + the r13 review fixes):
canary normalization, scaled-section inclusion, and errored-query
reporting. Pure python — no Spark session."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "bench_compare.py"),
)
bench_compare = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_compare)


def _artifact(queries=None, full=None, scaled=None, canary_median=None):
    art = {
        "queries": queries or {},
        "full_surface": full or {},
        "scaled": scaled or {},
    }
    if canary_median is not None:
        art["canary"] = {"median": canary_median, "spread": 2.0}
    return art


def test_canary_normalization_divides_out_window_drift():
    """A uniform 2x slowdown with a 2x canary shift is FLAT after
    normalization — the exact window-drift case the canary exists for."""
    old = _artifact(queries={"a": 1.0, "b": 2.0}, canary_median=0.1)
    new = _artifact(queries={"a": 2.0, "b": 4.0}, canary_median=0.2)
    out = bench_compare.compare(new, old)
    assert out["canary_normalized"] is True
    assert out["sum_ratio_raw"] == 2.0
    assert out["sum_ratio_normalized"] == 1.0
    assert out["median_ratio_normalized"] == 1.0
    assert out["flagged_regressions"] == [] and out["flagged_wins"] == []
    assert "flat" in out["verdict"]


def test_real_mover_survives_normalization_and_is_flagged():
    old = _artifact(queries={"a": 1.0, "b": 1.0}, canary_median=0.1)
    new = _artifact(queries={"a": 1.0, "b": 5.0}, canary_median=0.1)
    out = bench_compare.compare(new, old)
    flagged = [r["q"] for r in out["flagged_regressions"]]
    assert flagged == ["b"]


def test_scaled_rows_join_the_overlap():
    """The scaled section (train_curation_v2_16x) is first-class in the
    comparison — previously dropped, excluding exactly the row built to
    be the round-over-round curation comparison point."""
    old = _artifact(queries={"a": 1.0}, scaled={"big": 100.0}, canary_median=0.1)
    new = _artifact(queries={"a": 1.0}, scaled={"big": 110.0}, canary_median=0.1)
    out = bench_compare.compare(new, old)
    assert out["overlap"] == 2
    assert out["only_new"] == [] and out["only_old"] == []


def test_headline_wins_over_full_surface_and_scaled_on_overlap():
    old = _artifact(queries={"a": 1.0}, full={"a": 9.0}, canary_median=0.1)
    new = _artifact(queries={"a": 1.0}, full={"a": 9.0}, scaled={"a": 9.0},
                    canary_median=0.1)
    out = bench_compare.compare(new, old)
    assert out["sum_new"] == 1.0 and out["sum_old"] == 1.0


def test_errored_query_reported_not_masqueraded_as_deregistered():
    """bench.py records -1.0 on exception; a regression-to-failure must
    surface as errored_new + a verdict flag, NOT as only_old."""
    old = _artifact(queries={"a": 1.0, "b": 2.0}, canary_median=0.1)
    new = _artifact(queries={"a": 1.0, "b": -1.0}, canary_median=0.1)
    out = bench_compare.compare(new, old)
    assert out["errored_new"] == ["b"]
    assert out["only_old"] == []  # b was attempted, not de-registered
    assert "ERRORED in new run: b" in out["verdict"]
    # and the reverse direction: an error in old is not a "new" addition
    out2 = bench_compare.compare(old, new)
    assert out2["errored_old"] == ["b"] and out2["only_new"] == []


def test_pre_canary_artifacts_compare_raw_and_say_so():
    old = _artifact(queries={"a": 1.0})  # r11-era: no canary
    new = _artifact(queries={"a": 1.5}, canary_median=0.1)
    out = bench_compare.compare(new, old)
    assert out["canary_normalized"] is False
    assert out["sum_ratio_normalized"] == out["sum_ratio_raw"]
    assert "RAW" in out["verdict"]
