"""Parallelism guard for small-scan → heavy-stage plans.

A few MB of parquet arrives as 1-2 file splits, so everything downstream of
the scan — Arrow-batched enrichment UDFs, shingle explodes — inherits 1-2
partitions and runs on 1-2 cores of the cluster. `spread()` repartitions such
inputs up to the session's default parallelism; when the scan already has
enough splits (the at-scale case, where `spark.sql.files.maxPartitionBytes`
governs split count) it is a no-op costing only the partition-count check.

The repartition shuffles the COMPACT pre-fan-out rows — bounded by input
size, never by what the downstream stage produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    # Streaming plans cannot be inspected via .rdd (AnalysisException at
    # plan-build time) and micro-batch sources size their own partitions;
    # the semantically right guard there is a no-op.
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
