"""Similarity search over embedding columns (array<float>) — brute-force
cosine top-k baseline + LSH-bucketed ANN scale path (BASELINE.json
north-star).

Execution model (v2 — the round-1 pure-Column implementation unrolled 64-term
dot products into giant expression trees whose analysis/codegen time dwarfed
the actual math; see VERDICT r1):

- **Scoring is Arrow-batched numpy.** One Arrow batch = one float64 matmul
  (`C @ Q.T`), the canonical vectorized shape. Per-pair cost is a fused
  multiply-add, not an interpreted expression node.
- **The query side broadcasts.** `brute_force_topk`/`ann_topk` contractually
  take a small probe set (the "probe batch vs corpus" shape); the probes are
  collected once on the driver into a dense matrix and shipped to executors
  as a Spark broadcast variable. The corpus is NEVER collected — it streams
  through `mapInPandas` exactly once, emitting only per-batch partial top-k
  rows (≤ batches × |Q| × k), so the shuffle into the final global top-k
  window is tiny regardless of corpus size.
- **Partial top-k pushdown.** Each Arrow batch keeps only its local top-k per
  query under the same total order (sim desc, neighbor_id asc) as the final
  window — a global top-k element is necessarily inside its batch's top-k, so
  this is lossless (the map-side-combine of top-k).
- **ANN** buckets by random-hyperplane sign bits (deterministic seeded
  planes). Corpus rows score only against probes in their own bucket — the
  per-batch matmul shrinks ~2^n_planes-fold.
- **Near-dup pairs** (corpus × corpus) cannot broadcast either side: the
  bucket is computed per-row (Arrow numpy UDF), the self-join is a cheap
  equi-join on a long key, and the exact-cosine verify runs vectorized on
  candidate pairs only.

Determinism: all math is float64; cosine differs from a sequential-fold
oracle only in summation association (≤ a few ulps), absorbed by the 6-dp
rounding both sides apply.

At 100 TB: corpus streams (no shuffle before the partial top-k), probes
broadcast once per job, ANN bucket join shuffles 8-byte keys. The only
O(|Q|·|C|) operator is the exact baseline, by design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..parallel import spread as _spread

# --- exact Column-expression primitives (deterministic fold; small-dim use) -


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double — strictly left-to-right fold, bit-identical to a
    single-threaded sequential oracle. Interpreted (array HOFs don't codegen)
    — fine for per-row use, NOT for pairwise hot paths (use the Arrow/numpy
    scorers below)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- shared numpy helpers ---------------------------------------------------


def _to_matrix(series: pd.Series) -> np.ndarray:
    """array<float> column (Arrow → pandas object series of ndarrays/lists)
    to a dense float64 matrix."""
    return np.array([np.asarray(v, dtype=np.float64) for v in series], dtype=np.float64)


def _row_norms(m: np.ndarray) -> np.ndarray:
    return np.sqrt(np.einsum("ij,ij->i", m, m))


def _safe_norms(m: np.ndarray) -> np.ndarray:
    """Row norms clamped away from zero, for cosine DENOMINATORS: a zero
    vector then scores 0.0 against everything (its dot is 0) instead of NaN.
    NaN is poison here — numpy's lexsort ranks it LAST while Spark's window
    `sim DESC` ranks it FIRST, so a NaN that survives a small batch's
    partial top-k would evict a true neighbor at the global stage, and
    whether it survives depends on Arrow batch packing."""
    return np.maximum(_row_norms(m), 1e-12)


def _batch_topk_rows(
    q_ids: np.ndarray,
    c_ids: np.ndarray,
    sims: np.ndarray,
    k: int,
    q_subset: np.ndarray | None = None,
) -> pd.DataFrame | None:
    """Partial top-k per query within one scored batch.

    sims: |C_batch| × |Q| similarity matrix (columns follow q_ids order, or
    q_subset indices into q_ids when only some probes were scored). Keeps, per
    query, the k best rows under (sim desc, neighbor_id asc) — the same total
    order as the global window, so the pushdown is lossless. Self-matches
    (query_id == neighbor_id) are dropped here so they never count toward k.
    """
    # NaN similarities (a NaN component in either vector) rank LAST here
    # but FIRST under Spark's `sim DESC` window (Spark sorts NaN above all
    # numbers), so they must never leave the batch stage: map them to -inf,
    # which loses every comparison in both engines.
    sims = np.nan_to_num(sims, nan=-np.inf, posinf=np.inf, neginf=-np.inf)
    out_q, out_n, out_s = [], [], []
    cols = range(sims.shape[1]) if q_subset is None else range(len(q_subset))
    for j in cols:
        qi = q_ids[j] if q_subset is None else q_ids[q_subset[j]]
        col = sims[:, j]
        keep = c_ids != qi
        idx = np.nonzero(keep)[0]
        if idx.size == 0:
            continue
        # lexsort: primary sim desc, secondary neighbor_id asc
        order = np.lexsort((c_ids[idx], -col[idx]))[:k]
        sel = idx[order]
        out_q.append(np.full(sel.size, qi, dtype=np.int64))
        out_n.append(c_ids[sel])
        out_s.append(col[sel])
    if not out_q:
        return None
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "sim": np.concatenate(out_s),
        }
    )


_TOPK_SCHEMA = "query_id long, neighbor_id long, sim double"


def _global_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("sim"), 6).alias("sim"))
    )


def _collect_probes(
    queries: DataFrame, id_col: str, vec_col: str, max_probes: int = 100_000
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side materialization of the probe set — the one deliberate
    collect in the engine: broadcast variables require driver materialization,
    and the probe side is contractually small (a probe batch, not a table).

    `max_probes` enforces that contract (VERDICT r6 item 8): a caller who
    accidentally passes a corpus-sized frame as the probe side gets a clear
    error instead of a driver OOM at 100×. The limit+1 fetch bounds the
    check itself — the collect never exceeds max_probes + 1 rows. 100k
    probes × 64-dim float64 ≈ 50 MB broadcast, a sane driver ceiling; raise
    it explicitly for a bigger batch (and budget driver/executor memory),
    or flip the operator's sides so the big frame streams."""
    rows = queries.select(id_col, vec_col).limit(max_probes + 1).collect()
    if len(rows) > max_probes:
        raise ValueError(
            f"probe side exceeds max_probes={max_probes}: the probe frame is "
            "collected to the driver and broadcast, so it must be a bounded "
            "batch, not a table. Swap the sides (stream the big frame) or "
            "raise max_probes deliberately."
        )
    ids = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
    mat = np.array([np.asarray(r[1], dtype=np.float64) for r in rows], dtype=np.float64)
    return ids, mat


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each probe: (query_id, neighbor_id, sim).

    Plan: probes → driver → broadcast matrix; corpus streams once through
    mapInPandas (one matmul per Arrow batch, partial top-k per query per
    batch); global top-k via a window over ≤ batches × |Q| × k rows.
    """
    q_ids, q_mat = _collect_probes(queries, id_col, vec_col)
    q_norm = _safe_norms(q_mat)
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm))

    def score(batches):
        ids, qm, qn = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = _to_matrix(pdf[vec_col])
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_norm = _safe_norms(c_mat)
            sims = (c_mat @ qm.T) / (c_norm[:, None] * qn[None, :])
            out = _batch_topk_rows(ids, c_ids, sims, k)
            if out is not None:
                yield out

    scored = _spread(
        corpus.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    ).mapInPandas(score, _TOPK_SCHEMA)
    return _global_topk(scored, k)


# --- random-hyperplane LSH ANN --------------------------------------------


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic gaussian hyperplanes (seeded — the plan is reproducible
    run to run, and the DuckDB oracle inlines the identical literals)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def centroid_codebook(dim: int, n_centroids: int, seed: int = 7) -> list[list[float]]:
    """Deterministic seeded gaussian codebook, rows L2-normalized — the
    data-independent coarse quantizer for the ORACLE-GATED IVF path
    (`sim_ivf_topk`). A TRAINED codebook (the default `ivf_topk` path)
    comes out of a numpy-RNG k-means that no SQL engine can replay; these
    literals inline into the DuckDB oracle exactly like `hyperplanes`."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n_centroids, dim))
    return (m / np.maximum(_row_norms(m)[:, None], 1e-12)).tolist()


def _pack_sign_bits(mat: np.ndarray, planes_t: np.ndarray) -> np.ndarray:
    """bucket id per row: bit i = 1{row·plane_i > 0}, packed into int64."""
    bits = (mat @ planes_t) > 0  # n × n_planes
    out = np.zeros(mat.shape[0], dtype=np.int64)
    for i in range(bits.shape[1]):
        out |= bits[:, i].astype(np.int64) << i
    return out


def lsh_bucket_udf(planes: list[list[float]]):
    """Arrow-batched bucket assignment (replaces the r1 interpreted fold)."""
    planes_t = np.array(planes, dtype=np.float64).T

    @F.pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series(np.array([], dtype=np.int64))
        return pd.Series(_pack_sign_bits(_to_matrix(v), planes_t))

    return _bucket


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
    """Approximate top-k: corpus rows score only against probes sharing their
    LSH bucket. Same streaming shape as brute force — the bucket check is a
    numpy equality inside the batch, so there is no join at all; the matmul
    per batch shrinks ~2^n_planes-fold. Recall is tunable via n_planes."""
    planes_t = np.array(hyperplanes(dim, n_planes, seed), dtype=np.float64).T
    q_ids, q_mat = _collect_probes(queries, id_col, vec_col)
    q_norm = _safe_norms(q_mat)
    q_bucket = _pack_sign_bits(q_mat, planes_t)
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm, q_bucket))

    def score(batches):
        ids, qm, qn, qb = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = _to_matrix(pdf[vec_col])
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_norm = _safe_norms(c_mat)
            c_bucket = _pack_sign_bits(c_mat, planes_t)
            for j in range(len(ids)):
                in_bucket = np.nonzero(c_bucket == qb[j])[0]
                if in_bucket.size == 0:
                    continue
                sub = c_mat[in_bucket]
                sims = (sub @ qm[j]) / (c_norm[in_bucket] * qn[j])
                out = _batch_topk_rows(
                    ids, c_ids[in_bucket], sims[:, None], k, q_subset=np.array([j])
                )
                if out is not None:
                    yield out

    scored = _spread(
        corpus.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    ).mapInPandas(score, _TOPK_SCHEMA)
    return _global_topk(scored, k)


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd iterations on row-normalized vectors (spherical k-means).
    Deterministic: seeded init, fixed iteration count, ties break to the
    lowest centroid index (argmax semantics)."""
    rng = np.random.default_rng(seed)
    normed = sample / np.maximum(_row_norms(sample)[:, None], 1e-12)
    cent = normed[rng.choice(len(normed), size=min(n_centroids, len(normed)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(normed @ cent.T, axis=1)
        for c in range(len(cent)):
            members = normed[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    n_probe: int = 4,
    train_size: int = 4096,
    iters: int = 5,
    seed: int = 42,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN — the centroid-partitioned alternative to the
    hyperplane LSH path: train a small spherical-kmeans codebook on a
    bounded, deterministic corpus sample, assign every corpus row to its
    nearest centroid, and score each probe only against rows in its
    `n_probe` nearest cells.

    Same streaming shape as ann_topk — the codebook and probe matrix
    broadcast, the corpus streams once through mapInPandas (cell assignment
    is one matmul per Arrow batch), partial top-k pushes down, and the final
    window sees ≤ batches × |Q| × k rows. Training is a driver-side numpy
    kmeans over an orderBy(id).limit(train_size) sample — deterministic and
    bounded (a codebook is KB-scale; training data never exceeds
    train_size × dim floats). Recall/cost trades via n_probe exactly as in
    any IVF index.

    Pass `codebook` (pre-normalized rows, e.g. `centroid_codebook`) to skip
    training entirely — the deterministic quantizer the oracle gate needs;
    `n_centroids`/`train_size`/`iters`/`seed` are then ignored."""
    if codebook is not None:
        cent = np.array(codebook, dtype=np.float64)
    else:
        sample_rows = (
            corpus.select(vec_col).orderBy(F.col(id_col).asc()).limit(train_size).collect()
        )
        sample = np.array([np.asarray(r[0], dtype=np.float64) for r in sample_rows])
        cent = _kmeans(sample, n_centroids, iters, seed)

    q_ids, q_mat = _collect_probes(queries, id_col, vec_col)
    if len(q_ids) == 0:  # no probes -> no rows (shape-safe: q_mat is 1-D empty)
        return corpus.sparkSession.createDataFrame([], _TOPK_SCHEMA)
    q_norm = _safe_norms(q_mat)
    q_normed = q_mat / q_norm[:, None]
    n_probe_eff = min(n_probe, len(cent))
    # each probe's n_probe nearest cells (ties deterministic via argsort)
    q_cells = np.argsort(-(q_normed @ cent.T), axis=1, kind="stable")[:, :n_probe_eff]
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm, q_cells, cent))

    def score(batches):
        ids, qm, qn, qcells, cb = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = _to_matrix(pdf[vec_col])
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_norm = _safe_norms(c_mat)
            c_normed = c_mat / c_norm[:, None]
            c_cell = np.argmax(c_normed @ cb.T, axis=1)
            for j in range(len(ids)):
                in_cells = np.nonzero(np.isin(c_cell, qcells[j]))[0]
                if in_cells.size == 0:
                    continue
                sims = (c_mat[in_cells] @ qm[j]) / (c_norm[in_cells] * qn[j])
                out = _batch_topk_rows(
                    ids, c_ids[in_cells], sims[:, None], k, q_subset=np.array([j])
                )
                if out is not None:
                    yield out

    scored = _spread(
        corpus.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    ).mapInPandas(score, _TOPK_SCHEMA)
    return _global_topk(scored, k)


def self_knn(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """All-pairs approximate kNN: every corpus row's top-k cosine neighbors
    WITHIN the corpus (the kNN-graph builder behind SemDeDup-style pruning
    and embedding-cluster exploration). Neither side is a small probe set,
    so nothing broadcasts and no candidate pair-list is ever materialized:

    1. each row gets its hyperplane-sign bucket (Arrow-batched, no shuffle);
    2. ONE bucket-keyed exchange moves each (id, vector) to its bucket
       group — the vector crosses the wire exactly once (multiprobe adds
       m replicas), versus twice per CANDIDATE for a join-based plan;
    3. each group scores its members against each other with a single
       matmul and keeps a per-group partial top-k under the same
       (sim desc, neighbor_id asc) order as the final window — lossless;
    4. the global window merges ≤ (m+1) × k rows per query.

    Per-group cost is quadratic in bucket occupancy, so `n_planes` must
    grow with the corpus: the default auto-sizes to ~8 rows/bucket
    (⌈log₂(n/8)⌉ clamped to [8, 24], one count() job) — the same occupancy
    contract as ``embedding_near_dup_pairs``. A skewed (dense) region of
    embedding space concentrates in one bucket; AQE's skew split cannot
    divide a single group, so pathological corpora want more planes plus
    `multiprobe` to recover the recall the extra planes cost.

    `multiprobe` = m > 0 re-files each row as a QUERY (not a neighbor) into
    its m single-bit-flip neighbor buckets: a near-miss pair differing in
    one plane sign is recovered there. Queries appearing in several groups
    are merged by the global window.
    """
    if n_planes is None:
        n = df.count()
        n_planes = min(24, max(8, int(np.ceil(np.log2(max(n, 1) / 8.0)))))
    planes = hyperplanes(dim, n_planes, seed)
    bucket = lsh_bucket_udf(planes)
    side = _spread(df.filter(F.col(vec_col).isNotNull())).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    if multiprobe > 0:
        # two union branches (home + probe replicas) read `side`; without
        # the pin each re-runs the corpus scan + bucket UDF matmul — the
        # most expensive narrow stage — once per branch
        side = side.persist()
    exploded = side.withColumn("is_home", F.lit(True))
    if multiprobe > 0:
        probes = F.array(
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("long")
                for i in range(min(multiprobe, n_planes))
            ]
        )
        exploded = exploded.unionByName(
            side.select(
                "id",
                "v",
                F.explode(probes).alias("bucket"),
                F.lit(False).alias("is_home"),
            )
        )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "neighbor_id": [], "sim": []})
        mem = pdf[pdf["is_home"].to_numpy()]
        if len(mem) == 0:
            return empty
        m_mat = _to_matrix(mem["v"])
        m_ids = mem["id"].to_numpy(dtype=np.int64)
        m_norm = _safe_norms(m_mat)
        q_mat = _to_matrix(pdf["v"])
        q_ids = pdf["id"].to_numpy(dtype=np.int64)
        q_norm = _safe_norms(q_mat)
        sims = (m_mat @ q_mat.T) / (m_norm[:, None] * q_norm[None, :])
        out = _batch_topk_rows(q_ids, m_ids, sims, k)
        return out if out is not None else empty

    scored = exploded.groupBy("bucket").applyInPandas(score_group, _TOPK_SCHEMA)
    return _global_topk(scored, k)


def cosine_pairs_udf():
    """Vectorized exact cosine over candidate pairs (va, vb) — runs only on
    the post-bucketing candidate set, one Arrow batch = one fused op."""

    @F.pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series(np.array([], dtype=np.float64))
        a = _to_matrix(va)
        b = _to_matrix(vb)
        num = np.einsum("ij,ij->i", a, b)
        # NaN -> -1 (below any cosine threshold): Spark treats NaN as
        # LARGER than every number, so a NaN cosine would pass a
        # `>= threshold` filter instead of failing it
        return pd.Series(np.nan_to_num(num / (_safe_norms(a) * _safe_norms(b)), nan=-1.0))

    return _cos


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold) — the
    dedup-by-embedding operator from the north-star list. Corpus × corpus, so
    neither side broadcasts: rows bucket by hyperplane sign bits (identical
    vectors always share a bucket ⇒ recall 1.0 on exact copies), candidates
    self-join on the 8-byte bucket key, exact cosine verifies vectorized.

    `n_planes` MUST grow with the corpus — bucket count is 2^n_planes, so a
    fixed plane count makes per-bucket occupancy (and the candidate-verify
    cost, which is quadratic in it) grow linearly with data: measured 170 s
    at 400k vectors with 8 planes vs 21 s with 18, identical output. The
    default (None) sizes it automatically to target ~8 rows/bucket
    (⌈log₂(n/8)⌉, clamped to [8, 24]) at the cost of one count() job;
    recall on exact copies is plane-count-independent, and near-threshold
    recall is recovered with `multiprobe`.

    `multiprobe` = m > 0 additionally probes the m single-bit-flip neighbor
    buckets of each row's bucket (one side only — a pair collides iff A's
    probe set hits B's home bucket), raising recall on near-but-not-identical
    copies whose cosine sits near the threshold: a pair at angle θ flips any
    given plane with probability θ/π, and one flipped plane is exactly one
    Hamming-1 bucket away. Join fan-out grows (m+1)× on the probe side —
    still keyed on a long."""
    if n_planes is None:
        n = df.count()
        n_planes = min(24, max(8, int(np.ceil(np.log2(max(n, 1) / 8.0)))))
    planes = hyperplanes(dim, n_planes, seed)
    bucket = lsh_bucket_udf(planes)
    # persist the bucketed frame: BOTH self-join sides and both vector
    # re-attach joins read it, and without the pin each consumer re-runs
    # the scan + bucket UDF (the same lesson as the minhash shingle frame
    # and SemDeDup's assignment frame)
    side = _spread(df.filter(F.col(vec_col).isNotNull())).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), bucket(F.col(vec_col)).alias("bucket")
    ).persist()
    # SLIM self-join (VERDICT r2 item 2): only (id, bucket) rides the
    # bucket-keyed exchange — 16 bytes/row instead of 2×dim×8. The
    # multiprobe fan-out multiplies 16-byte rows, not vectors.
    a = side.select(F.col("id").alias("a"), "bucket")
    if multiprobe > 0:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("long")
                for i in range(min(multiprobe, n_planes))
            ],
        )
        a = a.select("a", F.explode(probes).alias("bucket"))
    b = side.select(F.col("id").alias("b"), "bucket")
    cand = a.join(b, "bucket").filter(F.col("a") < F.col("b")).select("a", "b")
    if multiprobe > 0:
        # a pair can collide via its home bucket AND several probe buckets;
        # dedupe while rows are still 16 bytes
        cand = cand.distinct()
    # re-attach vectors to the surviving candidates only — post-bucketing
    # the candidate set is small, so AQE turns these into broadcast joins
    # and the full vector column never enters an exchange
    cos = cosine_pairs_udf()
    return (
        cand.join(side.select(F.col("id").alias("a"), F.col("v").alias("va")), "a")
        .join(side.select(F.col("id").alias("b"), F.col("v").alias("vb")), "b")
        .select("a", "b", F.round(cos(F.col("va"), F.col("vb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int | None = None,
    n_assign: int = 2,
    train_size: int = 4096,
    iters: int = 5,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster embeddings
    with the IVF spherical-kmeans codebook, generate candidate pairs only
    WITHIN a cluster, verify with exact cosine. The k-means alternative to
    ``embedding_near_dup_pairs``' hyperplane buckets — data-adaptive cells
    concentrate near-dups harder than random planes on clustered corpora.

    Each row is assigned to its `n_assign` nearest centroids (multi-
    assignment: a near-dup pair straddling a cell boundary still shares the
    runner-up cell — the same recall trick as IVF multiprobe, applied on the
    index side). Candidates self-join on the int cell id, exact cosine
    verifies vectorized, duplicate candidates collapse before scoring.
    Training is the same bounded deterministic driver-side sample as
    ``ivf_topk``; everything after is one matmul per Arrow batch, a join
    keyed on an int, and the verify UDF over candidates only.

    `n_clusters` must grow with the corpus (same rule as
    ``embedding_near_dup_pairs``' plane count — per-cell occupancy drives a
    quadratic candidate-verify cost); the default (None) targets ~50
    rows/cell (n/50, clamped to [64, 4096]) at the cost of one count()."""
    if n_clusters is None:
        n_clusters = min(4096, max(64, df.count() // 50))
    sample_rows = df.select(vec_col).orderBy(F.col(id_col).asc()).limit(train_size).collect()
    sample = np.array([np.asarray(r[0], dtype=np.float64) for r in sample_rows])
    cent = _kmeans(sample, n_clusters, iters, seed)
    n_assign_eff = min(n_assign, len(cent))
    bc = df.sparkSession.sparkContext.broadcast(cent)

    @F.pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        m = _to_matrix(v)
        normed = m / _safe_norms(m)[:, None]
        top = np.argsort(-(normed @ bc.value.T), axis=1, kind="stable")[:, :n_assign_eff]
        return pd.Series(list(top.astype(np.int32)))

    # persist the assigned frame: both self-join sides read it, and without
    # the pin each side re-runs the scan + assignment UDF (the same lesson
    # as the minhash shingle frame — r2 measured 2× on the unpinned plan)
    assigned = _spread(df.filter(F.col(vec_col).isNotNull())).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        cells(F.col(vec_col)).alias("cells"),
    ).persist()
    # SLIM self-join (VERDICT r2 item 2): the cell-keyed exchange carries
    # (id, cells) — n_assign ints per row, not the embedding. Vectors
    # re-attach to the surviving candidates afterwards.
    side = assigned.select("id", "cells").withColumn("cell", F.explode("cells"))
    a = side.select(F.col("id").alias("a"), F.col("cells").alias("ca"), "cell")
    b = side.select(F.col("id").alias("b"), F.col("cells").alias("cb"), "cell")
    cand = (
        a.join(b, "cell")
        .filter(F.col("a") < F.col("b"))
        # multi-assignment makes a pair collide in up to n_assign shared
        # cells; keep it only where cell = min(shared cells) — an exact,
        # shuffle-free dedupe (the assignment arrays ride along as
        # n_assign ints) instead of a dropDuplicates
        .filter(F.col("cell") == F.array_min(F.array_intersect("ca", "cb")))
        .select("a", "b")
    )
    # post-clustering the candidate set is small → AQE broadcasts it; the
    # embedding column never enters an exchange
    cos = cosine_pairs_udf()
    return (
        cand.join(assigned.select(F.col("id").alias("a"), F.col("v").alias("va")), "a")
        .join(assigned.select(F.col("id").alias("b"), F.col("v").alias("vb")), "b")
        .select("a", "b", F.round(cos(F.col("va"), F.col("vb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Int8 scalar quantization of an embedding column — the stored-index
    form of the corpus for similarity workloads.

    Each vector is unit-normalized (cosine workloads only ever see the
    direction) and quantized symmetrically per vector:
    ``scale = max(|v̂ᵢ|) / 127``, ``qᵢ = round(v̂ᵢ / scale)`` ∈ [-127, 127].
    Output: (id, qvec array<tinyint>, qscale double). Reconstruction is
    ``qᵢ · qscale``; for unit vectors the per-component error is ≤ scale/2
    ≈ 4e-3 at dim 64, so a reconstructed dot product is within ~1-2e-2 of
    the exact cosine — plenty to PRUNE with, never to rank the final k by
    (``quantized_topk`` rescores exactly).

    Why it matters at 100 TB: the dominant cost of any exhaustive similarity
    pass is SCANNING the vector column. float64 arrays are 8 bytes/dim on
    the wire and in parquet; int8 is 1 byte/dim (and dictionary/RLE-friendly)
    — the stored index is ~8× smaller, so the scan, the page-cache working
    set, and any vector-bearing exchange shrink by the same factor. This is
    the same design as FAISS's SQ8 flat index, expressed relationally.
    """
    schema = f"{id_col} long, qvec array<tinyint>, qscale double"

    def quantize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _to_matrix(pdf[vec_col])
            normed = m / _safe_norms(m)[:, None]
            scale = np.maximum(np.abs(normed).max(axis=1), 1e-12) / 127.0
            q = np.rint(normed / scale[:, None]).astype(np.int8)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "qvec": list(q),
                    "qscale": scale,
                }
            )

    return (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(quantize, schema)
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | None = None,
) -> DataFrame:
    """Exact-rescored top-k over an int8-quantized corpus scan: approximate
    cosine (int8 reconstruction) PRUNES each Arrow batch to the `rerank`
    best candidates per probe, exact float64 cosine then ranks only those.
    Same output contract as ``brute_force_topk`` (query_id, neighbor_id,
    sim — sim is the EXACT cosine), and identical results whenever every
    true top-k member survives the prune. The effective shortlist per Arrow
    batch is max(`rerank`, batch_rows/16) — a floor of max(8k, 64) plus a
    fraction that SCALES with batch size, so a bigger corpus / coarser
    batching cannot shrink the shortlist relative to the candidate pool
    (int8 score error is ~1e-2; raise `rerank` for corpora with dense
    near-ties).

    Plan shape is the ``brute_force_topk`` streaming shape — probes
    broadcast, corpus streams once through mapInPandas, partial top-k
    pushes down losslessly, one tiny window at the end. The difference is
    WHAT streams: at scale the corpus side reads the stored
    ``quantize_embeddings`` index (1 byte/dim) for the prune and fetches
    float vectors only for the ≤ rerank×|Q| survivors per batch; here both
    columns ride the same frame, so the quantized prune is computed
    in-batch and the saving measured is compute (int8 GEMM-able prune +
    a rerank-sized exact matmul instead of a full one), while the I/O
    saving is documented by the stored-index twin.
    """
    if rerank is None:
        rerank = max(8 * k, 64)
    q_ids, q_mat = _collect_probes(queries, id_col, vec_col)
    q_norm = _safe_norms(q_mat)
    # broadcast only (ids, mat, norm) — the normalized matrix is a one-line
    # recompute executor-side, and shipping it too would double the payload
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm))

    def score(batches):
        ids, qm, qn = bq.value
        qnm = qm / qn[:, None]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = _to_matrix(pdf[vec_col])
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_norm = _safe_norms(c_mat)
            # --- prune: int8-reconstructed approximate cosine -------------
            c_normed = c_mat / c_norm[:, None]
            scale = np.maximum(np.abs(c_normed).max(axis=1), 1e-12) / 127.0
            q8 = np.rint(c_normed / scale[:, None]).astype(np.int8)
            approx = (q8.astype(np.float64) * scale[:, None]) @ qnm.T
            # shortlist scales with the batch so prune tightness is
            # independent of Arrow batch sizing (ADVICE r3): fixed floor
            # `rerank` + 1/16 of the batch's candidate pool
            r = min(max(rerank, approx.shape[0] // 16), approx.shape[0])
            # per probe: the r best corpus rows by approximate score
            cand = np.argpartition(-approx, r - 1, axis=0)[:r]  # r × |Q|
            # --- exact rescore on the union of survivors ------------------
            keep = np.unique(cand)
            sub = c_mat[keep]
            sims = (sub @ qm.T) / (c_norm[keep][:, None] * qn[None, :])
            # mask out rows a probe did not shortlist: they must not compete
            # (keeps the prune honest — the exact pass ranks survivors only)
            mask = np.zeros((keep.size, len(ids)), dtype=bool)
            pos = np.searchsorted(keep, cand)  # r × |Q| positions into keep
            mask[pos, np.arange(len(ids))[None, :]] = True
            sims = np.where(mask, sims, -np.inf)
            out = _batch_topk_rows(ids, c_ids[keep], sims, k)
            if out is not None:
                yield out

    scored = _spread(
        corpus.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    ).mapInPandas(score, _TOPK_SCHEMA)
    return _global_topk(scored, k)


def pq_codebooks(
    dim: int, m: int = 4, n_centroids: int = 16, seed: int = 11
) -> list[list[list[float]]]:
    """Deterministic per-subspace codebooks for the ORACLE-GATED PQ path:
    m spherical (unit-row) codebooks of `n_centroids` × (dim/m), seeded
    per subspace. For unit-norm centroids, L2-argmin over a codebook ==
    dot-argmax (||x − c||² = ||x||² + 1 − 2·x·c), so code assignment is
    the same argmax-over-literal-dots arithmetic the IVF oracle already
    replays. A TRAINED per-subspace k-means codebook (the production
    path) comes from numpy RNG no SQL engine can replay — same seam as
    `centroid_codebook`."""
    assert dim % m == 0, "dim must split evenly into m subspaces"
    return [
        centroid_codebook(dim // m, n_centroids, seed=seed + j) for j in range(m)
    ]


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Product-quantization ADC top-k — the third point on the
    compression/recall curve after SQ8 (`quantized_topk`, 1 byte/dim)
    and IVF (`ivf_topk`, pruning): PQ stores only m small centroid CODES
    per vector (64-dim float32 → m=4 bytes, a 64× compression), and
    scores a query against the whole corpus via asymmetric distance
    computation — per subspace, a |codebook|-entry lookup table of
    query-to-centroid dots, summed at the code positions (Jégou et al.
    2011). Returned `sim` is the APPROXIMATE cosine (the stored-codes
    production path has no float vectors to rescore with; compose with
    `quantized_topk`'s rescore shape when vectors are fetchable).

    Plan shape is the `brute_force_topk` streaming shape: probes
    broadcast once (LUTs are |Q|·m·16 doubles), the corpus streams once
    through mapInPandas — per batch, m tiny (n × 16) GEMMs assign codes
    on the NORMALIZED vector (first-max argmax, np.argmax order) and an
    LUT gather scores all probes; partial top-k pushes down losslessly;
    one tiny window at the end. At 100 TB the scan reads 4 bytes/vector
    of codes instead of 256 bytes of floats — the I/O story IS the
    operator."""
    q_ids, q_mat = _collect_probes(queries, id_col, vec_col)
    # explicit codebooks OVERRIDE m (ADVICE r9: validated, not silently
    # rebound — a caller whose codebook count disagrees with m gets an
    # error, not a quiet reinterpretation)
    if codebooks is not None and len(codebooks) != m:
        raise ValueError(
            f"pq_topk: {len(codebooks)} codebooks passed but m={m}; pass "
            "m=len(codebooks) (m is the subspace count)"
        )
    cbs = codebooks if codebooks is not None else pq_codebooks(q_mat.shape[1], m=m)
    C = [np.asarray(cj, dtype=np.float64) for cj in cbs]
    q_norm = _safe_norms(q_mat)
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm))

    def score(batches):
        ids, qm, qn = bq.value
        ds = qm.shape[1] // m
        # per-subspace LUT: query-to-centroid dots (|Q| × n_centroids)
        luts = [qm[:, j * ds : (j + 1) * ds] @ C[j].T for j in range(m)]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = _to_matrix(pdf[vec_col])
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_norm = _safe_norms(c_mat)
            cm = c_mat / c_norm[:, None]
            approx = np.zeros((c_mat.shape[0], len(ids)))
            for j in range(m):
                dots = cm[:, j * ds : (j + 1) * ds] @ C[j].T  # n × 16
                codes = np.argmax(dots, axis=1)  # first-max, ties to low idx
                approx += luts[j][:, codes].T  # n × |Q|
            approx = approx / qn[None, :]
            out = _batch_topk_rows(ids, c_ids, approx, k)
            if out is not None:
                yield out

    scored = _spread(
        corpus.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    ).mapInPandas(score, _TOPK_SCHEMA)
    return _global_topk(scored, k)


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    m: int = 4,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_codebook: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    n_centroids: int = 64,
    train_size: int = 4096,
    iters: int = 5,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ — the production ANN composition (Jégou et al. 2011's
    IVFADC shape): a coarse quantizer prunes the search to each probe's
    `n_probe` nearest cells (the `ivf_topk` stage), and the surviving
    rows are scored by PQ asymmetric distance over stored codes (the
    `pq_topk` stage) — so a 100-TB scan reads m bytes/vector of codes
    AND touches only n_probe/n_centroids of them per probe: the two
    orthogonal cost reductions multiplied, which is why this is what
    FAISS deploys at billion scale.

    Plan shape: both stages' small state broadcasts once (coarse
    codebook + per-probe cell lists + per-subspace LUTs); the corpus
    streams ONCE through mapInPandas — per Arrow batch, one matmul
    assigns coarse cells and m tiny GEMMs assign PQ codes on the
    normalized vector (first-max argmax, the `pq_topk` discipline);
    each probe then LUT-gathers scores for rows in its cells only.
    Partial top-k pushes down losslessly; one tiny window at the end.
    Scored `sim` is the APPROXIMATE cosine (stored codes have no floats
    to rescore with — compose with `quantized_topk`'s rescore shape when
    vectors are fetchable).

    Pass `coarse_codebook` (`centroid_codebook`) and `codebooks`
    (`pq_codebooks`) for the fully-deterministic oracle-gated seam;
    omit them to train the coarse quantizer exactly as `ivf_topk` does
    (driver-side seeded k-means on a bounded deterministic sample —
    the production path, pytest-pinned)."""
    if coarse_codebook is not None:
        cent = np.array(coarse_codebook, dtype=np.float64)
    else:
        sample_rows = (
            corpus.select(vec_col).orderBy(F.col(id_col).asc()).limit(train_size).collect()
        )
        sample = np.array([np.asarray(r[0], dtype=np.float64) for r in sample_rows])
        cent = _kmeans(sample, n_centroids, iters, seed)

    q_ids, q_mat = _collect_probes(queries, id_col, vec_col)
    if len(q_ids) == 0:
        return corpus.sparkSession.createDataFrame([], _TOPK_SCHEMA)
    if codebooks is not None and len(codebooks) != m:
        raise ValueError(
            f"ivfpq_topk: {len(codebooks)} codebooks passed but m={m}; pass "
            "m=len(codebooks) (m is the subspace count)"
        )
    cbs = codebooks if codebooks is not None else pq_codebooks(q_mat.shape[1], m=m)
    C = [np.asarray(cj, dtype=np.float64) for cj in cbs]
    q_norm = _safe_norms(q_mat)
    q_normed = q_mat / q_norm[:, None]
    n_probe_eff = min(n_probe, len(cent))
    q_cells = np.argsort(-(q_normed @ cent.T), axis=1, kind="stable")[:, :n_probe_eff]
    bq = corpus.sparkSession.sparkContext.broadcast(
        (q_ids, q_mat, q_norm, q_cells, cent)
    )

    def score(batches):
        ids, qm, qn, qcells, cb = bq.value
        ds = qm.shape[1] // m
        # per-subspace LUT: query-to-centroid dots (|Q| × n_centroids)
        luts = [qm[:, j * ds : (j + 1) * ds] @ C[j].T for j in range(m)]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = _to_matrix(pdf[vec_col])
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_norm = _safe_norms(c_mat)
            cm = c_mat / c_norm[:, None]
            c_cell = np.argmax(cm @ cb.T, axis=1)
            codes = [
                np.argmax(cm[:, j * ds : (j + 1) * ds] @ C[j].T, axis=1)
                for j in range(m)
            ]
            for jp in range(len(ids)):
                in_cells = np.nonzero(np.isin(c_cell, qcells[jp]))[0]
                if in_cells.size == 0:
                    continue
                # sequential LUT accumulation — the same fixed summation
                # order as pq_topk (and the oracle's d0+d1+d2+d3), so
                # equal-code rows are bitwise-equal and ties break by
                # neighbor_id identically in both engines
                s = luts[0][jp, codes[0][in_cells]]
                for j in range(1, m):
                    s = s + luts[j][jp, codes[j][in_cells]]
                s = s / qn[jp]
                out = _batch_topk_rows(
                    ids, c_ids[in_cells], s[:, None], k, q_subset=np.array([jp])
                )
                if out is not None:
                    yield out

    scored = _spread(
        corpus.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    ).mapInPandas(score, _TOPK_SCHEMA)
    return _global_topk(scored, k)


def kmeans_fixed(
    df: DataFrame,
    k: int = 8,
    n_rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-round Lloyd's k-means over an embedding column, returning the
    final (id, cluster) assignment — the fully-distributed generalization
    of the bounded-sample codebook training IVF/SemDeDup use, and (like
    `x_pagerank`/`x_kcore`) oracle-checkable BECAUSE the round count is
    fixed: deterministic init (the k lowest-id vectors, cluster = position)
    plus a deterministic argmin tie-break (lowest cluster index) make
    every round a pure function of the data.

    Scale shape per round: centroids broadcast (k×dim floats); ONE pass
    over the vectors in Arrow batches computes each partition's per-cluster
    (sum_vec, count) PARTIALS — a k-row frame per partition — and only
    those k×partitions tiny rows leave the executors (collected and
    reduced on the driver: bounded by contract, like the probe-matrix
    collects above). The vectors themselves never shuffle, for any corpus
    size. Empty clusters keep their previous centroid. The final output is
    the assignment against the last round's centroids — one more
    broadcast-and-scan, no shuffle at all."""
    if k < 1 or n_rounds < 0:
        raise ValueError("kmeans_fixed: k >= 1 and n_rounds >= 0 required")
    spark = df.sparkSession
    slim = df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    init_rows = slim.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init_rows) < k:
        raise ValueError(f"kmeans_fixed: need at least k={k} vectors")
    cents = np.array([r[0] for r in init_rows], dtype=np.float64)

    partial_schema = "cluster int, s array<double>, n long"

    for _ in range(n_rounds):
        b = spark.sparkContext.broadcast(cents)

        def partials(batches):
            C = b.value
            sums = np.zeros_like(C)
            cnts = np.zeros(len(C), dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                M = _to_matrix(pdf[vec_col])
                d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
                a = d.argmin(axis=1)  # ties -> lowest cluster index
                for j in range(len(C)):
                    m = a == j
                    if m.any():
                        sums[j] += M[m].sum(axis=0)
                        cnts[j] += int(m.sum())
            yield pd.DataFrame(
                {
                    "cluster": np.arange(len(C), dtype=np.int32),
                    "s": [list(map(float, row)) for row in sums],
                    "n": cnts,
                }
            )

        # k rows per partition — bounded by contract; reduce on the driver
        rows = slim.mapInPandas(partials, partial_schema).collect()
        sums = np.zeros_like(cents)
        cnts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["s"], dtype=np.float64)
            cnts[r["cluster"]] += r["n"]
        nxt = cents.copy()  # empty clusters keep their previous centroid
        nonempty = cnts > 0
        nxt[nonempty] = sums[nonempty] / cnts[nonempty, None]
        cents = nxt

    bfin = spark.sparkContext.broadcast(cents)

    def assign(batches):
        C = bfin.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = _to_matrix(pdf[vec_col])
            d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "cluster": d.argmin(axis=1).astype(np.int32),
                }
            )

    return slim.mapInPandas(assign, f"{id_col} long, cluster int")


from .._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
