"""Similarity search over embedding columns (array<float>) — brute-force
cosine top-k baseline + LSH-bucketed ANN scale path (BASELINE.json
north-star).

Math stays JVM-side: dot products via zip_with + aggregate (sequential fold
⇒ deterministic, bit-identical to a single-threaded oracle), norms
precomputed once per side before the join. No Python in the hot path.

Scale posture:
- brute force is O(|Q|·|C|) — correct baseline and fine when one side is
  small enough to broadcast (the typical "probe batch vs corpus" shape);
  the corpus side streams, the query side broadcasts.
- ANN: random-hyperplane LSH buckets the corpus; probes only join their own
  bucket (+ multiprobe neighbors). Hyperplanes are deterministic literals
  derived from a seeded RNG — the plan is reproducible run to run.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ in double — strictly left-to-right addition, so the result is
    bit-identical to a single-threaded sequential oracle.

    With `dim` known, the sum unrolls to a static expression chain that
    whole-stage codegen compiles (array higher-order functions are
    interpreted in Spark and ~10× slower in the join hot path); the addition
    order is the same left-associative sequence as the fold, so results are
    bit-identical between the two forms.
    """
    if dim is not None:
        out = None
        for i in range(1, dim + 1):
            term = F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            out = term if out is None else out + term
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
) -> DataFrame:
    """Exact top-k neighbors for each query: (query_id, neighbor_id, sim).

    Plan: normalize norms once per side → broadcast the (small) query side →
    cross-join streams the corpus exactly once → per-query top-k via
    row_number window partitioned by query (AQE handles per-query skew).
    Self-matches (same id) are excluded. Ties break on neighbor_id asc so
    results are total-ordered and reproducible.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col), dim).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col), dim).alias("cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("sim"), 6).alias("sim"))
    )


# --- random-hyperplane LSH ANN --------------------------------------------


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic gaussian hyperplanes (driver-side literals; n_planes ×
    dim floats is a few KB — ships inside the plan, no broadcast join)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit i = 1{vec·plane_i > 0}, packed into a long.

    Uses the fold-form dot deliberately: unrolling n_planes × dim terms into
    one projection exceeds janino's method limits (codegen compile fails and
    the WHOLE stage falls back to interpreted). The bucket is computed once
    per row — not in the pairwise hot path — so the interpreted fold is the
    right trade."""
    bits = [
        F.when(
            dot(vec_col, F.array(*[F.lit(float(v)) for v in plane])) > 0,
            F.lit(1).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias(f"b{i}")
        for i, plane in enumerate(planes)
    ]
    out = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        out = out.bitwiseOR(F.shiftleft(b, i))
    return out


def ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. 2^n_planes buckets ⇒ the cross-join shrinks ~2^n_planes-fold;
    recall is tunable via n_planes (fewer planes = bigger buckets = higher
    recall, more work). The join key is a long — cheap shuffle."""
    planes = hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col), dim).alias("qn"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col), dim).alias("cn"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("sim"), 6).alias("sim"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold) via the
    same LSH bucketing — the dedup-by-embedding operator from the north-star
    list. High-cosine pairs collide in sign-bit buckets with high
    probability; at scale add multiprobe (flip one bit) for recall."""
    planes = hyperplanes(dim, n_planes, seed)
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col), dim).alias("n"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    a = side.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"), "bucket")
    b = side.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(dot(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
