"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what a cluster deployment would set per-executor:
AQE on (runtime re-plan, skew-join splitting, partition coalescing), Arrow on
(every enrichment UDF crosses the JVM boundary in columnar batches), shuffle
partitions sized to the parallelism actually available instead of the
200-partition default, and UTC so event-time semantics are stable.

At 100 TB these same settings hold; only `shuffle.partitions` (or, better,
leaving AQE's coalescing to pick the number) and `files.maxPartitionBytes`
get re-derived from cluster size. Nothing in the engine assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "spark-social-analytics",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    `shuffle_partitions` defaults to the core count: on `local[N]` more than
    N partitions per shuffle only adds scheduling overhead for our data
    sizes, and AQE coalesces down when partial aggregation shrinks the data.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Broadcast threshold: dims (region/nation/supplier, subreddit/user
        # dimension tables) should broadcast; raise from the 10 MB default.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Driver testdata parquet uses TIMESTAMP(NANOS); read as long and
        # repair in schemas.load_table (Spark rejects nanos otherwise).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Runtime bloom-filter join pruning: when one join side is selective,
        # inject a bloom filter of its keys into the other side's scan —
        # at 100 TB this skips reading most of a fact table when the dim
        # side carries a filter. Purely a runtime optimization; plans and
        # results are unchanged.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Constraint propagation is quadratic in plan width and measured
        # 5-80× optimizer-time blowups on our wide hash/signature plans
        # (minhash, simhash, unrolled dot products). Our plans state their
        # filters explicitly, so inferred constraints buy nothing here.
        .config("spark.sql.constraintPropagation.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
