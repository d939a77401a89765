"""Multi-dimensional data layout — Z-order (Morton) clustering keys.

The reference stores its post/comment tables however Glue writes them
(reference: terraform/main.tf:365-411 — no layout control at all); at
100 TB the write-side LAYOUT decides the read-side scan cost. Sorting by
one column gives parquet min/max pruning on that column only; a Z-order
key interleaves the bits of several columns' bucket ranks so that rows
close in ANY participating dimension land close in the linear order —
after `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)`, every
file's min/max envelope is tight in EVERY dimension and a predicate on
any of them skips most files (the technique behind Delta/Iceberg
OPTIMIZE ZORDER; Morton 1966).

Everything is exact BIGINT shift/mask arithmetic — offset from the
column minimum, drop low bits, interleave — so the key is
engine-reproducible and the demo query is hash-gated (no float boundary
to disagree on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _shift_bucket(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Rank `col` into [0, 2^bits): subtract `lo`, then drop the low
    `shift` bits so the span's top `bits` bits remain. Shift-only BIGINT
    arithmetic — exact and identical in any engine (a BIGINT `DIV` by an
    arbitrary span would be too, but float division would not: near
    integer boundaries the correctly-rounded double quotient can floor
    to the wrong bucket)."""
    shift = max(0, int(hi - lo).bit_length() - bits)
    v = F.least(F.greatest(col, F.lit(lo).cast("long")), F.lit(hi).cast("long"))
    return F.shiftright(v - F.lit(lo).cast("long"), shift)


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of dimension d lands at position
    i * n_dims + d. Constant-folded shift/mask expression tree — stays
    inside whole-stage codegen, no UDF."""
    n = len(buckets)
    out = F.lit(0).cast("long")
    for d, b in enumerate(buckets):
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + d)
            )
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[int, int]] | None = None,
    out_col: str = "zkey",
) -> DataFrame:
    """Append a Z-order key over integral columns `cols`.

    Each column is bucketed into [0, 2^bits) by dropping the low bits of
    its offset from the column minimum — bounds supplied via `bounds` or
    computed by ONE 1-row min/max aggregate (a bounded scalar collect,
    the same contract as the IVF codebook) — then the buckets' bits
    interleave into a single long. `bits * len(cols)` must be ≤ 63.

    The key itself is a narrow projection; the LAYOUT win comes from
    `zorder_layout` (range-repartition + sort by the key before a
    write), after which parquet min/max pruning works on every
    participating column instead of just a lead sort column."""
    if bits * len(cols) > 63:
        raise ValueError(f"bits*dims = {bits * len(cols)} exceeds a signed long")
    if bounds is None:
        row = df.agg(
            *[F.min(c).cast("long").alias(f"lo_{c}") for c in cols],
            *[F.max(c).cast("long").alias(f"hi_{c}") for c in cols],
        ).collect()[0]  # bounded: one row, 2*len(cols) scalars
        bounds = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
    buckets = [
        _shift_bucket(
            F.col(c).cast("long"), int(bounds[c][0]), int(bounds[c][1]), bits
        )
        for c in cols
    ]
    return df.withColumn(out_col, _interleave(buckets, bits))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = 16,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Cluster `df` for writing: Z-order key, range-repartition on it
    (contiguous key ranges per output file — the property that makes the
    per-file min/max envelopes disjoint and tight), sort within
    partitions, and drop the key (it is a layout device, not data).
    Feed the result straight to a writer."""
    keyed = zorder_key(df, cols, bits=bits, bounds=bounds)
    return (
        keyed.repartitionByRange(n_partitions, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey")
    )


def file_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max/count stats index over a parquet dataset — the
    skipping metadata a lakehouse table format keeps in its manifest
    (Delta/Iceberg file stats), built with one aggregate over the
    `_metadata.file_path` pseudo-column. Returns
    (file, n_rows, min_<c>, max_<c> ...). Build it once at write time
    (ideally over a `zorder_layout`-ed dataset, whose per-file envelopes
    are tight in every dimension); the index is one row per FILE —
    metadata-sized, broadcastable, cheap to keep current."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.select(F.col("_metadata.file_path").alias("file"), *cols).groupBy(
        "file"
    ).agg(*aggs)


def pruned_read(
    spark,
    path: str,
    predicates: dict[str, tuple],
    stats: DataFrame | None = None,
) -> DataFrame:
    """Read only the files whose stats envelope intersects every
    `col: (lo, hi)` range predicate, then re-apply the exact predicate —
    file-level data skipping on columns parquet footer pruning alone
    cannot serve once file count dwarfs the row-group hit rate.

    The surviving-file list is a driver collect BOUNDED by the file
    count (planner-sized metadata, the same contract as a catalog
    listing — never data rows). Dropping a file whose min_<c> is NULL is
    correct: min/max skip nulls, so an all-null file has no row a range
    predicate could match."""
    stats = stats if stats is not None else file_stats(spark, path, list(predicates))
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        cond = cond & (F.col(f"max_{c}") >= lo) & (F.col(f"min_{c}") <= hi)
    files = [r.file for r in stats.filter(cond).select("file").collect()]
    if not files:
        out = spark.read.parquet(path).limit(0)
    else:
        out = spark.read.parquet(*files)
    for c, (lo, hi) in predicates.items():
        out = out.filter(F.col(c).between(lo, hi))
    return out
