"""Optional Delta Lake routing for the merge-upsert family (VERDICT r10
item 8): SURVEY §1-§2's Spark mapping for the reference's idempotent
upserts (Cypher MERGE, reference: glue/reddit_glue.py:72-79; the T+2/3-day
score re-crawl, reddit/lambda_function_aggregate.py:59-71) says "Delta
MERGE"; the engine ships a crash-safe manifested-parquet MERGE so it has
zero hard dependencies. This adapter closes the cluster-adoption gap:
when `delta-spark` is importable, `merge_upsert_auto` routes through a
real Delta `MERGE INTO` (one dependency, zero code change); otherwise it
falls back to `writers.merge_upsert` unchanged.

Semantics contract (mirrors `writers.merge_upsert` exactly):
- updates win over existing rows; among duplicate update keys the largest
  `order_col` wins — Delta MERGE requires unique source keys, so the
  source is pre-deduped with the same window;
- last-writer-wins across calls: a matched row updates only when
  `s.order_col >= t.order_col` (>= keeps update-over-existing on ties,
  the `__src` provenance rule of the parquet path);
- key comparison is null-safe (`<=>`), matching the window partitioning
  of the parquet path where NULL keys group together.
"""

from __future__ import annotations

import importlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import writers


def _delta_table_cls():
    """The `delta.tables.DeltaTable` class, or None when delta-spark is
    not importable (the sandbox default). Resolved per call — cheap, and
    it lets tests fake the module both ways."""
    try:
        mod = importlib.import_module("delta.tables")
    except ImportError:
        return None
    return getattr(mod, "DeltaTable", None)


def delta_available() -> bool:
    """True when `delta-spark` is importable in this environment."""
    return _delta_table_cls() is not None


def _dedupe_updates(
    updates: DataFrame, keys: list[str], order_col: str | None
) -> DataFrame:
    """Largest-`order_col` row per key among the updates themselves —
    Delta MERGE rejects sources with duplicate match keys, and this is
    the same pre-merge winner `writers.merge_upsert`'s window picks."""
    order = [F.col(order_col).desc()] if order_col is not None else [F.lit(1)]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert_auto(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """`merge_upsert` through Delta `MERGE INTO` when delta-spark is
    importable; the crash-safe manifested-parquet merge otherwise.

    With Delta: a MISSING target bootstraps as a new Delta table
    (partitioned by `partition_cols` when given — Delta then scopes the
    MERGE rewrite to touched partitions on its own, the job
    `merge_upsert_manifested` does by hand for parquet). An EXISTING
    non-Delta dir at `target_path` — a table the parquet merge was
    maintaining before delta-spark got installed — keeps routing through
    `writers.merge_upsert`, so installing the dependency never breaks a
    working upsert job; migrate such tables explicitly with Delta's
    `CONVERT TO DELTA` when ready, after which calls route to MERGE."""
    DeltaTable = _delta_table_cls()
    if DeltaTable is None:
        return writers.merge_upsert(spark, target_path, updates, keys, order_col)
    src = _dedupe_updates(updates, keys, order_col)
    if not DeltaTable.isDeltaTable(spark, target_path):
        fs, p = writers._hadoop_fs(spark, target_path)
        if fs.exists(p):
            # pre-existing plain-parquet table: the bootstrap save would
            # hard-error on the non-empty dir — keep the parquet merge
            return writers.merge_upsert(spark, target_path, updates, keys, order_col)
        w = src.write.format("delta")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.save(target_path)
        return DeltaTable.forPath(spark, target_path).toDF()
    cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
    dt = DeltaTable.forPath(spark, target_path)
    m = dt.alias("t").merge(src.alias("s"), cond)
    if order_col is not None:
        m = m.whenMatchedUpdateAll(condition=f"s.`{order_col}` >= t.`{order_col}`")
    else:
        m = m.whenMatchedUpdateAll()
    m.whenNotMatchedInsertAll().execute()
    return dt.toDF()
