"""Approximate/sketch aggregates — the single-pass, mergeable summaries a
100-TB profile job runs instead of exact aggregation.

The reference computes its rollups exactly on small batches (counts/argmax in
glue jobs, reference: glue/twitter_glue.py:93-99); at training-data scale the
same questions — how many distinct authors, what does the length distribution
look like, which tokens dominate — are answered with sketches:

- **HyperLogLog** distinct counts (`approx_count_distinct`): fixed-size
  (KB-scale) mergeable state per group, ~2% default error, vs an exact
  distinct whose shuffle is the size of the key universe.
- **Quantile sketch** (`percentile_approx`, a Greenwald-Khanna variant):
  percentiles in one pass with bounded state, no global sort. An exact
  median of 100 TB is a full-table sort; the sketch is a scan.
- **Heavy hitters**: frequency of the top candidate values. Exact counting
  of ALL values shuffles the whole universe; sample-then-verify counts a
  sample to nominate candidates, then exactly counts ONLY candidate rows.
  (Spark's `freqItems` one-pass sketch exists but returns no counts and
  over-reports.)

All three stay entirely in Tungsten codegen (built-in aggregates, no UDFs,
no collects) and compose with groupBy — partial aggregation is map-side, so
the shuffle carries sketch state, not rows. Tests assert error bounds
against exact answers; these are deliberately NOT in the oracle gate
(DuckDB's approx sketches are different algorithms with different
estimates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def approx_distinct(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None, rsd: float = 0.02
) -> DataFrame:
    """HLL distinct count per group (columns: group..., approx_distinct).
    `rsd` = target relative standard deviation; state size grows as rsd
    shrinks (~1.04/sqrt(m))."""
    agg = F.approx_count_distinct(F.col(value_col), rsd).alias("approx_distinct")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: list[float] = (0.25, 0.5, 0.75, 0.95),
    group_cols: list[str] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """One-pass quantile sketch per group (columns: group..., quantiles
    array<double> aligned with `probabilities`). `accuracy` bounds the rank
    error at 1/accuracy with O(accuracy) state."""
    agg = F.percentile_approx(
        F.col(value_col).cast("double"),
        F.array(*[F.lit(float(p)) for p in probabilities]),
        F.lit(accuracy),
    ).alias("quantiles")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    n: int = 10,
    sample_fraction: float = 0.05,
    n_candidates: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Top-`n` most frequent values with EXACT counts, shuffling only a
    sample plus a bounded candidate set — never the full value universe.

    A naive `groupBy(value).count().limit(n)` shuffles one partial row per
    distinct value; when the universe is heavy-tailed (tokens, URLs, user
    ids) that shuffle is O(rows). Sample-then-verify bounds it: phase 1
    counts a `sample_fraction` sample and keeps its top `n_candidates`
    (default 4×n) as candidates; phase 2 exactly counts ONLY candidate rows
    (broadcast semi-join, then a ≤ n_candidates-key aggregate). Cost: two
    scans instead of one; shuffle: O(sample distinct) + O(n_candidates).

    Probabilistic completeness: a true heavy hitter with frequency share s
    appears ~s·fraction·N times in the sample — for the shares worth calling
    "heavy" (s ≳ 1/(10·n)) it makes the candidate set with overwhelming
    probability at any realistic N. Raise `sample_fraction` for small data
    (tests use 1.0, making the result exact and deterministic).

    NULLs are excluded (a semi-join cannot match them and "null is the top
    value" is a data-quality question, not a heavy-hitter one — ask it with
    a plain null-count filter).

    Returns (value, freq) ordered freq desc, value asc (A7 tie-break)."""
    n_cand = n_candidates or 4 * n
    vals = df.select(F.col(value_col).alias("value")).filter(F.col("value").isNotNull())
    sampled = vals if sample_fraction >= 1.0 else vals.sample(sample_fraction, seed)
    candidates = (
        sampled.groupBy("value")
        .agg(F.count(F.lit(1)).alias("__sc"))
        .orderBy(F.col("__sc").desc(), F.col("value").asc())
        .limit(n_cand)
        .select("value")
    )
    exact = (
        vals.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return exact.orderBy(F.col("freq").desc(), F.col("value").asc()).limit(n)
