"""Lineage truncation with an optional RELIABLE checkpoint (VERDICT r2
item 4).

Every iterative operator (connected_components, comment_depth,
range_join's left path) must truncate lineage per round — Catalyst
re-analyzes the full logical plan each round otherwise, and analysis cost
compounds catastrophically past ~10 nested joins. `localCheckpoint` does
that at zero I/O cost but stores the blocks on EXECUTORS: lose one
executor mid-job and the blocks are gone with no lineage to rebuild them —
the job dies. Fine on local[32] (one JVM: if it dies, everything dies);
not fine on a 1000-executor cluster where node loss is routine.

`truncate_lineage(df, checkpoint_dir)` is the switch: with a dir set
(HDFS/S3 path on a cluster) it uses reliable `df.checkpoint()` — blocks
live in the shared filesystem and survive any executor — at the cost of
one write+read per truncation; with None it keeps the zero-I/O local
form. Operators accept `checkpoint_dir: str | None = None` and pass it
through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, checkpoint_dir: str | None = None, eager: bool = True) -> DataFrame:
    """Materialize `df` and cut its lineage. With `checkpoint_dir`, a
    reliable (executor-loss-tolerant) checkpoint under that dir; without,
    `localCheckpoint` (fast, blocks on executors). Setting the dir is
    idempotent and cheap, so it is (re)applied per call rather than made a
    session-construction concern."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)
