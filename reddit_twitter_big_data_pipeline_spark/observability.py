"""One-pass job metrics via Spark's Observation API — data-quality counters
collected DURING an action instead of with a second scan (at 100 TB a
"count the nulls first" pre-pass doubles the job; observe() rides the
existing one). The runtime complement of plans/audit.py's plan-time
assertions; the reference has no metrics at all beyond CloudWatch job
status (SURVEY §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def corpus_observation(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, Observation]:
    """Attach corpus-health metrics to a frame: returns (observed_df, obs).
    Run ANY action on observed_df (or a descendant), then read
    `obs.get` — a dict with n_rows, n_null_text, n_empty_text, avg_len,
    n_null_id. Zero extra passes; metrics aggregate on the executors as
    the rows stream by."""
    obs = Observation()
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(col).isNull().cast("long")).alias("n_null_text"),
        F.sum((F.col(col) == "").cast("long")).alias("n_empty_text"),
        F.avg(F.length(col)).alias("avg_len"),
        F.sum(F.col(id_col).isNull().cast("long")).alias("n_null_id"),
    )
    return observed, obs


def assert_corpus_health(
    metrics: dict,
    max_null_frac: float = 0.01,
    min_avg_len: float = 1.0,
) -> None:
    """Gate a pipeline on its observed metrics (call after the action).
    Raises ValueError with the offending numbers — the cheap circuit
    breaker between 'the scrub emptied the corpus' and a 100-TB write of
    garbage."""
    n = metrics["n_rows"] or 0
    if n == 0:
        raise ValueError("corpus is empty")
    null_frac = (metrics["n_null_text"] or 0) / n
    if null_frac > max_null_frac:
        raise ValueError(
            f"null-text fraction {null_frac:.4f} exceeds {max_null_frac}"
        )
    if (metrics["avg_len"] or 0.0) < min_avg_len:
        raise ValueError(f"avg text length {metrics['avg_len']} under {min_avg_len}")


def column_profile(df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True) -> DataFrame:
    """One-pass per-column data profile — (col_name, n_rows, n_null,
    n_distinct, min_value, max_value), min/max as strings so mixed types
    stack into one frame. The Deequ/Glue-crawler-style profiling pass the
    reference got from its daily schema crawler (reference:
    terraform/main.tf:312) — here it is ONE aggregation over the table
    (every column's counters compute in the same partial-agg pass; no
    per-column scans) followed by a driver-side pivot of a single row.

    `exact_distinct=False` swaps count(distinct) for approx_count_distinct
    (HLL) — at 100 TB the exact form's per-column distinct expand is the
    cost, and profile jobs rarely need it; the exact default exists for
    oracle comparability and small dims."""
    # `is None` sentinel: an explicitly-passed empty list means "profile
    # nothing", not "profile everything" — on a wide table the difference
    # is a no-op vs a full multi-distinct aggregation
    cols = [f.name for f in df.schema.fields] if cols is None else cols
    distinct_fn = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct_fn(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()  # one row — bounded by contract
    spark = df.sparkSession
    out = [
        (c, int(row["__n"]), int(row[f"{c}__nulls"]), int(row[f"{c}__distinct"]),
         row[f"{c}__min"], row[f"{c}__max"])
        for c in cols
    ]
    return spark.createDataFrame(
        out, "col_name string, n_rows long, n_null long, n_distinct long, min_value string, max_value string"
    )
