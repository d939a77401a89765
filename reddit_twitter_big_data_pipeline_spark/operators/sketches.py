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

- **Count-min sketch** (`cms_build`/`cms_estimate`/`cms_merge`): a
  deterministic, mergeable depth×width counter matrix addressed by md5 —
  point frequency estimates (overestimate-only, ≤ εN error) for probe
  values chosen AFTER the scan, with a fixed-size state the exact
  group-by can't match at universe scale.

All stay entirely in Tungsten codegen (built-in aggregates, no UDFs, no
collects) and compose with groupBy — partial aggregation is map-side, so
the shuffle carries sketch state, not rows. HLL/quantiles tests assert
error bounds against exact answers; those two are deliberately NOT in the
oracle gate (DuckDB's approx sketches are different algorithms with
different estimates). The CMS is different: its hash seam is md5, so a
DuckDB oracle rebuilds the exact sketch and the estimate query IS
hash-gated (`x_cms_freq`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


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


def _cms_bucket(value: Column, row: int, width: int, salt: str) -> Column:
    """Row `row`'s counter index for `value`: a 60-bit md5 prefix mod
    `width` — the engine's cross-engine hash seam (same trick as
    sampling.py's md5 backend), so an oracle in any engine with md5 can
    rebuild the sketch bit-for-bit:
    `('0x' || substr(md5(salt || row || ':' || v), 1, 15))::BIGINT % width`."""
    seed = F.concat(F.lit(f"{salt}{row}:"), value)
    return (F.conv(F.substring(F.md5(seed), 1, 15), 16, 10).cast("long") % width).alias(
        "bucket"
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over a value
    stream: `depth` independent hash rows of `width` counters each.
    Returns (row, bucket, cnt) with ≤ depth·width rows — a fixed-size,
    MERGEABLE frequency summary (union of streams = element-wise `sum`
    of sketches, see `cms_merge`), vs an exact count whose output is the
    size of the value universe.

    Unlike `heavy_hitters` (sample-then-verify, needs the candidate set
    up front), a CMS answers point frequency queries decided AFTER the
    scan, overestimates only (never under), with error ≤ εN for
    ε = e/width at probability 1-δ, δ = e^-depth.

    Scale shape: one narrow projection computes all `depth` buckets per
    input row (posexplode of a depth-length array — no join, no UDF,
    whole-stage codegen), then ONE aggregation whose map-side partial
    collapses every partition to ≤ depth·width rows before the shuffle —
    the shuffle carries sketch state, not data rows, regardless of input
    size. NULLs are excluded (they have no frequency identity).
    """
    vals = (
        df.select(F.col(value_col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    buckets = vals.select(
        F.posexplode(
            F.array(*[_cms_bucket(F.col("v"), j, width, salt) for j in range(depth)])
        ).alias("row", "bucket")
    )
    return buckets.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS sketches built with the SAME (depth, width, salt):
    element-wise counter sum. The mergeability that makes the sketch a
    distributed-aggregation citizen — per-partition / per-day sketches
    roll up without touching the underlying rows."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point-query frequencies from a CMS: for each probe value the
    estimate is min over the `depth` rows of the addressed counter
    (a value whose bucket was never touched reads 0 — the value is
    definitively absent). Returns (value string, cms_count long).

    The sketch side is ≤ depth·width rows BY CONSTRUCTION, so it
    broadcasts — the probe stream (which may be another table's worth of
    values) never shuffles: compute each probe's `depth` addresses
    narrowly, map-side hash-join against the broadcast counters, and the
    only exchange is the final ≤ depth-rows-per-probe min aggregate."""
    p = (
        probes.select(F.col(probe_col).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    addressed = p.select(
        "value",
        F.posexplode(
            F.array(
                *[_cms_bucket(F.col("value"), j, width, salt) for j in range(depth)]
            )
        ).alias("row", "bucket"),
    )
    joined = addressed.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        "value", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )
    return joined.groupBy("value").agg(F.min("cnt").alias("cms_count"))
