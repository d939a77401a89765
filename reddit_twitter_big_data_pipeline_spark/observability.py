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
