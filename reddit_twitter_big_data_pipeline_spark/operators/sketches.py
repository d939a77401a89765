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
- **KMV distinct sketch** (`kmv_build`/`kmv_estimate`): the k smallest
  md5 hashes of the distinct values per group — a ≤ k-row mergeable
  distinct-count state with ~1/√k relative error that degrades to an
  EXACT count for groups under k distinct values.

All stay entirely in Tungsten codegen (built-in aggregates, no UDFs, no
collects) and compose with groupBy — partial aggregation is map-side, so
the shuffle carries sketch state, not rows. HLL/quantiles tests assert
error bounds against exact answers; those two are deliberately NOT in the
oracle gate (DuckDB's approx sketches are different algorithms with
different estimates). The CMS and KMV are different:
their hash seam is md5, so a DuckDB oracle rebuilds the exact sketch
state and both estimate queries ARE hash-gated (`x_cms_freq`,
`x_kmv_users_daily`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


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


_KMV_SPAN = float(1 << 60)  # the 60-bit md5-prefix hash space


def kmv_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    salt: str = "kmv:",
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002):
    per group, the `k` smallest 60-bit md5 hashes of the DISTINCT values.
    Returns (group..., hash long) with ≤ k rows per group — fixed-size,
    mergeable (`kmv_merge`: union, dedupe, re-take the k smallest),
    and DETERMINISTIC: md5 is the engine's cross-engine hash seam, so an
    oracle rebuilds the identical sketch and the estimate is hash-gated
    (like the CMS above, unlike HLL).

    Scale shape: hash in the SCAN stage, then one distinct on
    (group, hash) — the dedupe shuffle the exact count needs anyway, but
    carrying an 8-byte long instead of the raw value string (r13, guide
    §2.3 "shuffle fewer bytes": for shingle-gram inputs the value strings
    are 30-60 bytes, so the exchange shrinks 4-7×; KMV set algebra is
    defined over the hash set, so deduping hashes instead of values is
    the sketch's own semantics). Then a per-group window rank keeps the
    k smallest — the window sorts only the group's DISTINCT hashes
    (WindowExec spills, hub groups cannot OOM a task)."""
    groups = list(group_cols or [])
    h = (
        df.select(*groups, F.col(value_col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .select(
            *groups,
            F.conv(
                F.substring(F.md5(F.concat(F.lit(salt), F.col("v"))), 1, 15), 16, 10
            )
            .cast("long")
            .alias("hash"),
        )
        .distinct()
    )
    w = Window.partitionBy(*groups).orderBy(F.col("hash").asc()) if groups else (
        Window.partitionBy().orderBy(F.col("hash").asc())
    )
    return (
        h.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(
    *sketches: DataFrame, k: int = 256, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge KMV sketches built with the SAME (k, salt): union the hash
    frames, drop hashes seen in several sketches (the same value observed
    in several streams), re-take the k smallest per group. The result is
    IDENTICAL to building one sketch over the concatenated streams —
    per-day / per-shard sketches roll up without revisiting values."""
    groups = list(group_cols or [])
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    w = Window.partitionBy(*groups).orderBy(F.col("hash").asc()) if groups else (
        Window.partitionBy().orderBy(F.col("hash").asc())
    )
    return (
        merged.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    sketch: DataFrame, k: int = 256, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: with n = hashes kept and
    h_k = the largest of them (normalized into [0,1)), the estimate is
    (k-1)/h_k — k-1 uniform points observed in a prefix of length h_k —
    or EXACTLY n when the group never filled its k slots (the sketch
    degrades gracefully to an exact distinct for small groups). Returns
    (group..., n_distinct_est double). One ≤-k-rows-per-group aggregate;
    the arithmetic is a single double division, engine-reproducible."""
    groups = list(group_cols or [])
    agg = sketch.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"), F.max("hash").alias("hk")
    )
    return agg.select(
        *groups,
        F.when(F.col("n") < k, F.col("n").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(_KMV_SPAN) / F.col("hk").cast("double")
        )
        .alias("n_distinct_est"),
    )


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    b: int = 6,
    salt: str = "hll:",
) -> DataFrame:
    """Deterministic HyperLogLog registers (Flajolet et al. 2007) over the
    md5 hash seam: per group, ≤ m = 2^b rows (bucket, rho) where bucket is
    the top `b` bits of the 60-bit md5-prefix hash and rho is the leading-
    zero rank of the remaining 60-b bits (1-based; an all-zero tail reads
    61-b). Absent buckets are implicit rho=0. Unlike Spark's built-in
    `approx_count_distinct` (whose xxhash/dense-register internals no
    other engine reproduces), every step here is md5 + integer/string ops
    both engines define identically — bucket split by shift/mask, rho by
    the length of the minimal binary rendering (Spark `conv(w,10,2)` ==
    DuckDB `bin(w)`) — so an oracle rebuilds the registers bit-for-bit and
    the ESTIMATE is hash-gated, which neither built-in HLL can offer.

    Scale shape: one distinct on (group, value) — the shuffle an exact
    count needs anyway — then a groupBy(group, bucket).max(rho) whose
    map-side partial collapses each partition to ≤ m rows per group
    before the exchange. State is fixed-size and mergeable (`hll_merge`:
    union + max — the register lattice join).
    """
    groups = list(group_cols or [])
    tail_bits = 60 - b
    dv = (
        df.select(*groups, F.col(value_col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
    )
    h = dv.select(
        *groups,
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("v"))), 1, 15), 16, 10)
        .cast("long")
        .alias("hash"),
    )
    split = h.select(
        *groups,
        F.shiftright(F.col("hash"), tail_bits).alias("bucket"),
        (F.col("hash") - F.shiftleft(F.shiftright(F.col("hash"), tail_bits), tail_bits)).alias("w"),
    )
    rho = split.select(
        *groups,
        "bucket",
        F.when(
            F.col("w") > 0,
            F.lit(tail_bits + 1)
            - F.length(F.conv(F.col("w").cast("string"), 10, 2)).cast("long"),
        )
        .otherwise(F.lit(tail_bits + 1))
        .cast("long")
        .alias("rho"),
    )
    return rho.groupBy(*groups, "bucket").agg(F.max("rho").alias("rho"))


def hll_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge HLL register frames built with the SAME (b, salt): union and
    re-take the per-bucket max. Identical to building one sketch over the
    concatenated streams — the register-lattice join that makes HLL the
    canonical mergeable distinct sketch."""
    groups = list(group_cols or [])
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*groups, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame, b: int = 6, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate from HLL registers, arranged so the float
    seam is ONE division (plus ln only on the small-range branch):
    the harmonic denominator sum(2^-rho) over all m registers is computed
    as the exact LONG sum(2^(SCALE-rho)) (SCALE = 61-b ≥ max rho, so every
    term is an exact power-of-two integer; order-independent, no double
    accumulation), zero registers contribute (m - present)·2^SCALE, and
    the raw estimate is the single division alpha·m²·2^SCALE / S with the
    numerator folded into one plan-time literal. Small-range correction
    (raw ≤ 2.5m and empty registers exist) switches to linear counting
    m·ln(m/V) — the one transcendental, whose ≤1-ulp cross-libm wobble
    sits far below the oracle gate's 9-significant-digit canonicalization.
    Returns (group..., n_distinct_est double).
    """
    groups = list(group_cols or [])
    m = 1 << b
    scale = 61 - b
    numer = _hll_alpha(m) * float(m) * float(m) * float(1 << scale)
    agg = sketch.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.expr(f"shiftleft(1L, {scale} - rho)")).alias("s_present"),
    )
    tot = agg.select(
        *groups,
        "nb",
        (
            F.col("s_present")
            + (F.lit(m).cast("long") - F.col("nb")) * F.lit(1 << scale).cast("long")
        ).alias("s_tot"),
    )
    raw = F.lit(numer) / F.col("s_tot").cast("double")
    zeros = F.lit(m).cast("long") - F.col("nb")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return tot.select(
        *groups,
        F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear)
        .otherwise(raw)
        .alias("n_distinct_est"),
    )


def kmv_intersect_estimate(
    sketch: DataFrame,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Pairwise set-INTERSECTION estimates between groups from one KMV
    sketch frame (theta-sketch set algebra, Dasgupta et al. 2016): for
    groups A and B, theta = min(theta_A, theta_B) where theta_g is the
    group's k-th smallest hash (or the full 2^60 span when the group
    never filled k slots — its sketch is exhaustive), and the estimate is
    |{h in sk_A ∩ sk_B : h < theta}| / (theta / 2^60). Every input is an
    integer hash comparison; the single double division is the only float
    op, so the estimate is deterministic and ORACLE-REBUILDABLE — the
    overlap question (shared users between two event streams, common
    n-grams between two shards) answered from fixed-size per-group state
    without re-scanning either stream.

    Returns one row per unordered group pair (g_a < g_b lexically):
    (g_a, g_b, n_common_est double). The sketch frame is ≤ k rows per
    group BY CONSTRUCTION, so both the theta frame and the hash self-join
    broadcast; nothing here scales with the underlying data.
    """
    if len(group_cols) != 1:
        raise ValueError("kmv_intersect_estimate expects exactly one group column")
    g = group_cols[0]
    thetas = sketch.groupBy(g).agg(
        F.count(F.lit(1)).alias("n"), F.max("hash").alias("hk")
    ).select(
        F.col(g).alias("grp"),
        F.when(F.col("n") < k, F.lit(1 << 60).cast("long"))
        .otherwise(F.col("hk"))
        .alias("theta"),
    )
    a = sketch.select(F.col(g).alias("g_a"), "hash")
    bside = sketch.select(F.col(g).alias("g_b"), "hash")
    common = a.join(bside, "hash").filter(F.col("g_a") < F.col("g_b"))
    paired = (
        common.join(F.broadcast(thetas.withColumnRenamed("grp", "g_a")), "g_a")
        .withColumnRenamed("theta", "theta_a")
        .join(F.broadcast(thetas.withColumnRenamed("grp", "g_b")), "g_b")
        .withColumnRenamed("theta", "theta_b")
        .withColumn("theta", F.least("theta_a", "theta_b"))
    )
    counted = (
        paired.filter(F.col("hash") < F.col("theta"))
        .groupBy("g_a", "g_b", "theta")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return counted.select(
        "g_a",
        "g_b",
        (
            F.col("n_common").cast("double")
            * (F.lit(float(1 << 60)) / F.col("theta").cast("double"))
        ).alias("n_common_est"),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Bloom filter over the distinct keys of `df`, as a (word, bits)
    frame of ≤ m_bits/64 LONG rows — the build side of a runtime join
    filter. Each key sets `k_hashes` bits addressed by the md5 seam
    (`pos_j = 60-bit md5('salt j:' || key) % m_bits`), aggregated with
    ONE map-side-partial `bit_or` — the shuffle carries ≤ m_bits/64 words
    regardless of input size, and the result broadcasts at any scale
    (8 KB per 2^16 bits). Deterministic: an oracle (or a checkpoint
    re-run) rebuilds the identical bit array.

    This is the hand-rolled twin of Spark's internal runtime filter
    (`bloom_filter_agg`/`might_contain`, not in the public function
    registry): build on the selective side of a join, `bloom_prune` the
    big side BEFORE its shuffle — rows the filter rejects are guaranteed
    non-matches (no false negatives), so the exact join that follows
    only re-checks the surviving ≤ fpp false positives."""
    keys = (
        df.select(F.col(key_col).cast("string").alias("k"))
        .filter(F.col("k").isNotNull())
        .distinct()
    )
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{salt}{j}:"), F.col("k"))), 1, 15
                            ),
                            16,
                            10,
                        ).cast("long")
                        % m_bits
                    )
                    for j in range(k_hashes)
                ]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_prune(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Drop probe rows whose key is definitively absent from the Bloom
    filter. Entirely MAP-SIDE: each of the `k_hashes` membership checks
    is one broadcast hash join on the word index (the filter frame is
    ≤ m_bits/64 rows) plus a bitwise AND — the probe stream never
    shuffles, never aggregates, and rows drop in the scan stage, which
    is the entire point of a runtime filter at 100 TB: the following
    exact join shuffles only survivors. Guarantees: every true match
    survives (no false negatives); survivors may include ~fpp false
    positives, so compose with the exact join for final results.

    r13 note — this k-join shape was re-adjudicated against three
    alternatives by interleaved A/B and WON; do not "simplify" it
    without re-measuring: a 1-row map<word,bits> crossJoin was 1.41×
    (map element_at is a linear entry scan), a 1-row dense-array
    crossJoin 1.62× (BroadcastNestedLoopJoin sits outside whole-stage
    codegen and splits the pipeline), and a collect-to-plan-literal
    dense array 1.41× (identical filter time, but the bounded collect
    is an extra SEQUENTIAL job where the lazy joins pipeline the filter
    build into the one action). All four forms are map-side at scale.
    r14 (ADVICE r13): the three losing variants are COMMITTED as
    explicit arms of tools/ab_r13_sketch_shapes.py (bloom_map /
    bloom_arr / bloom_lit), so the adjudication is reproducible from
    the repo."""
    out = probe
    for j in range(k_hashes):
        pos = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(f"{salt}{j}:"), F.col(key_col).cast("string"))
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        pcol, wcol, bcol, mcol = f"__blp{j}", f"__blw{j}", f"__blb{j}", f"__blm{j}"
        side = F.broadcast(
            bloom.select(F.col("word").alias(wcol), F.col("bits").alias(bcol))
        )
        out = (
            out.withColumn(pcol, pos)
            .withColumn(wcol, F.shiftright(F.col(pcol), 6))
            .withColumn(mcol, F.expr(f"shiftleft(1L, CAST({pcol} % 64 AS INT))"))
            .join(side, wcol, "left")
            .filter(
                F.col(bcol).isNotNull()
                & (F.col(bcol).bitwiseAND(F.col(mcol)) != 0)
            )
            .drop(pcol, wcol, bcol, mcol)
        )
    return out


# --- HDR-histogram quantile sketch ------------------------------------------


def hdr_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    precision_bits: int = 6,
) -> DataFrame:
    """HDR-histogram (log-bucketed) quantile sketch over NON-NEGATIVE
    longs (negative/null rows are dropped — the classic HDR domain;
    scale/offset first for signed data). Each value keeps its top
    `precision_bits` significant bits: bucket lower bound
    lo = (v >> s) << s with s = bit_length(v) - precision_bits (values
    shorter than precision_bits are EXACT). Bucket width ≤ lo/2^(p-1),
    so any quantile read from bucket lower bounds has relative error
    < 2^-(precision_bits-1), and per-group state is bounded by
    ~(64 - p + 1)·2^(p-1) + 2^p rows regardless of data size.

    Every step is integer-only — bit_length via the proven
    length(conv(v,10,2)) == length(bin(v)) seam (see `hll_build`), shift
    and mask in longs — so a SQL oracle replays the sketch bit-for-bit:
    a HASH-GATED quantile sketch, which percentile_approx's GK internals
    cannot offer. Counts are plain longs: merging sketches is a
    groupBy-sum (`hdr_merge`), the mergeability GK lacks cheaply.

    Scale shape: one map-side-combined groupBy on (group, lo) — the
    sketch never shuffles raw values, only ≤ state-bound bucket rows.
    """
    groups = list(group_cols or [])
    v = df.select(*groups, F.col(value_col).cast("long").alias("v")).filter(
        F.col("v").isNotNull() & (F.col("v") >= 0)
    )
    p = int(precision_bits)
    lo = F.expr(
        f"CASE WHEN v = 0 THEN 0 "
        f"WHEN length(conv(v, 10, 2)) <= {p} THEN v "
        f"ELSE shiftleft(shiftright(v, length(conv(v, 10, 2)) - {p}),"
        f" length(conv(v, 10, 2)) - {p}) END"
    )
    return (
        v.select(*groups, lo.alias("lo"))
        .groupBy(*groups, "lo")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(*sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge HDR sketches built with the SAME precision_bits: union and
    re-sum the bucket counts — identical to building one sketch over the
    concatenated inputs (counts are additive)."""
    groups = list(group_cols or [])
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*groups, "lo").agg(F.sum("cnt").alias("cnt"))


def hdr_quantile(
    sketch: DataFrame,
    percents: list[int],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from an HDR sketch. `percents` are INTEGER
    percentiles (50, 95, 99, ...) so the target rank is exact integer
    arithmetic — rank = ceil(n·pct/100) = (n·pct + 99) div 100, no
    float ceil boundary for an oracle to disagree on. The estimate is
    the lower bound of the bucket containing the rank-th value (a true
    data lower bound; relative error per `hdr_build`). Returns
    (group..., pct int, est long)."""
    groups = list(group_cols or [])
    wc = Window.partitionBy(*groups).orderBy(F.col("lo").asc())
    wn = Window.partitionBy(*groups)
    pf = F.broadcast(
        sketch.sparkSession.createDataFrame([(int(x),) for x in percents], "pct int")
    )
    cum = sketch.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "n", F.sum("cnt").over(wn)
    )
    return (
        cum.crossJoin(pf)
        .filter(
            F.col("cum")
            >= F.expr("(n * CAST(pct AS BIGINT) + 99) div 100")
        )
        .groupBy(*groups, "pct")
        .agg(F.min("lo").alias("est"))
    )


def kmv_join_size(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str | None = None,
    k: int = 256,
    salt: str = "kmv:",
) -> DataFrame:
    """Equi-join OUTPUT-cardinality estimate from per-side KMV key
    sketches carrying per-key row counts — the planner feed that decides
    broadcast vs shuffle vs salting BEFORE a 100-TB join launches.
    |A ⋈ B| = Σ_over_keys ca·cb; the sketch estimates it on the shared
    hash sample below θ = min of the two sides' k-th-smallest hashes
    (full 2^60 span for a side under k distinct keys, so the estimate
    degrades to EXACT when both sides fit their sketches — and a
    SELF-join size Σ cnt², the quadratic blowup a planner fears most,
    is just a==b). Every step is integer + the md5 seam except the ONE
    final double multiply/divide, so the estimate is hash-gateable.

    Scale shape: per side, one groupBy(key) count (map-side combined)
    then a ≤ k-row window keep — the raw tables never shuffle beyond
    the count, and everything after carries (8-byte hash, long count).
    Returns one row: (join_rows_est double, n_shared_sampled long)."""
    key_b = key_b or key_a

    def side(df: DataFrame, key: str, tag: str):
        c = (
            df.select(F.col(key).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias(f"cnt_{tag}"))
        )
        h = c.select(
            F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("v"))), 1, 15), 16, 10)
            .cast("long")
            .alias(f"hash_{tag}"),
            f"cnt_{tag}",
        )
        w = Window.partitionBy().orderBy(F.col(f"hash_{tag}").asc())
        sk = (
            h.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
        th = sk.agg(
            F.when(F.count(F.lit(1)) < k, F.lit(1 << 60).cast("long"))
            .otherwise(F.max(f"hash_{tag}"))
            .alias(f"theta_{tag}")
        )
        return sk, th

    sk_a, th_a = side(a, key_a, "a")
    sk_b, th_b = side(b, key_b, "b")
    theta = (
        th_a.crossJoin(F.broadcast(th_b))  # two 1-row bounded frames
        .select(F.least("theta_a", "theta_b").alias("theta"))
    )
    shared = sk_a.join(sk_b, sk_a["hash_a"] == sk_b["hash_b"]).crossJoin(
        F.broadcast(theta)
    )
    agg = shared.filter(F.col("hash_a") < F.col("theta")).agg(
        F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    # empty shared sample -> one row of zeros (theta re-read via its own
    # 1-row frame so the estimate row always exists)
    return (
        agg.crossJoin(F.broadcast(theta.select(F.col("theta").alias("__t"))))
        .select(
            F.coalesce(
                F.col("s").cast("double") * (F.lit(_KMV_SPAN) / F.col("__t").cast("double")),
                F.lit(0.0),
            ).alias("join_rows_est"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_shared_sampled"),
        )
    )
