"""Deterministic sampling and dataset splits — the selection operators a
training-data pipeline runs after cleaning/dedup.

Everything keys on a HASH of a stable id, never on rand(): re-running the
pipeline (or running it on a different partitioning / cluster size) selects
the SAME rows, so samples are reproducible, splits stay disjoint across
runs, and downstream caches stay valid. This is the idempotency rule the
engine applies everywhere (enrichment, dedup) extended to sampling —
`df.sample()`'s per-partition RNG changes membership whenever partitioning
changes, which silently leaks val rows into train on a re-shard.

All operators are single narrow filters (no shuffle, pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# granularity of hash buckets: fractions resolve to 1/1e6
_BUCKETS = 1_000_000


def _bucket(id_col: str, salt: str, hash_fn: str = "xxhash64") -> F.Column:
    """Stable per-row bucket in [0, 1e6): hash of (salt, id). The salt
    decorrelates different samples over the same table — sampling 10% for
    eval with salt A and 10% for audit with salt B overlaps ~1%, not 100%.

    hash_fn: "xxhash64" (JVM-fast, default) or "md5" (60-bit prefix,
    reproducible in any engine with md5 — the same cross-engine seam as
    dedup's SimHash; the DuckDB mirror is
    `('0x' || substr(md5(salt || CAST(id AS VARCHAR)), 1, 15))::BIGINT
    % 1000000`)."""
    if hash_fn == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        return h % _BUCKETS
    return F.pmod(F.xxhash64(F.lit(salt), F.col(id_col)), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keeps rows whose id-hash bucket
    falls under `fraction`. Same rows every run, any partitioning."""
    return df.filter(_bucket(id_col, salt, hash_fn) < int(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "strata",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of rare languages,
    5% of English). `fractions` maps stratum value → keep fraction; strata
    not listed keep `default_fraction`. One narrow filter — the fraction map
    becomes a CASE expression, no join, no shuffle."""
    frac = F.lit(float(default_fraction))
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.filter(_bucket(id_col, salt, hash_fn) < (frac * _BUCKETS).cast("long"))


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Epoch-weighted source mixing — the "2 epochs of wiki, 0.25 epochs of
    CC" primitive of training-mix assembly. Each row is emitted
    ⌊w⌋ + Bernoulli(frac(w)) times, where w is its source's weight: whole
    epochs replicate every row; the fractional epoch is the same
    deterministic id-hash sample as ``hash_sample`` (so re-runs and
    re-shards emit the IDENTICAL mix, and the fractional subset of epoch
    k+1 is the standard "first frac(w) of the next pass" convention).

    Output = input columns + ``repeat_idx`` (1-based copy number), so
    downstream sequence packing treats copies as distinct examples. One
    narrow projection + one explode — no shuffle; weights become a CASE
    expression, never a join."""
    if any(v < 0 for v in weights.values()) or default_weight < 0:
        raise ValueError("mix_sources: weights must be non-negative")
    w = F.lit(float(default_weight))
    for s, v in weights.items():
        w = F.when(F.col(source_col) == s, F.lit(float(v))).otherwise(w)
    whole = F.floor(w).cast("int")
    frac_cut = ((w - F.floor(w)) * _BUCKETS).cast("long")
    b = _bucket(id_col, salt, hash_fn)
    n_copies = whole + F.when(b < frac_cut, 1).otherwise(0)
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("repeat_idx", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.5,
    target_total: int | None = None,
    source_col: str = "source",
) -> dict[str, float]:
    """Temperature-scaled mixture weights (the multilingual/multi-source
    pretraining knob): source sampling probability ∝ n_s^alpha, converted
    to the per-source EPOCH weights ``mix_sources`` consumes, scaled so
    the expected mixed-corpus size is `target_total` (default: the input
    size — pure re-balancing). alpha=1 keeps natural proportions (every
    weight 1.0); alpha=0 equalizes sources outright; 0<alpha<1 upsamples
    the tail sources the way multilingual mixes do without letting a head
    source dominate.

    The aggregation is one map-side-combinable count; the result is
    O(#sources) on the driver (bounded by contract — sources are a
    handful of corpus names, not a data-scale key). Weights are rounded
    to 9 decimals so the downstream hash-bucket cut is reproducible
    across engines and summation orders.
    """
    if alpha < 0:
        raise ValueError("temperature_weights: alpha must be >= 0")
    counts = {
        r[0]: r[1] for r in df.groupBy(source_col).count().collect()
    }
    if None in counts:
        # A NULL source would silently diverge downstream: mix_sources'
        # CASE chain (col == lit) is null for NULL and falls through to
        # default_weight, so the computed weight would never apply.
        # Refuse loudly instead (ADVICE r3).
        raise ValueError(
            "temperature_weights: NULL values in source column "
            f"{source_col!r}; filter or fill them before weighting"
        )
    if not counts:
        return {}
    total = sum(counts[s] for s in sorted(counts))
    t = float(target_total) if target_total is not None else float(total)
    ps = {s: float(c) ** alpha for s, c in counts.items()}
    z = sum(ps[s] for s in sorted(ps))
    return {s: round(ps[s] / z * t / counts[s], 9) for s in counts}


def _split_cutoffs(weights: tuple[float, float, float]) -> tuple[int, int]:
    total = sum(weights)
    return (
        int(weights[0] / total * _BUCKETS),
        int((weights[0] + weights[1]) / total * _BUCKETS),
    )


def split_train_val_test(
    df: DataFrame,
    weights: tuple[float, float, float] = (0.98, 0.01, 0.01),
    id_col: str = "doc_id",
    salt: str = "split",
    hash_fn: str = "xxhash64",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Disjoint, exhaustive, reproducible 3-way split by id-hash range.
    Membership depends only on (salt, id) — growing the corpus later keeps
    every existing row in its original split (no train/val leakage across
    dataset versions), the property random splits lose."""
    b = _bucket(id_col, salt, hash_fn)
    c1, c2 = _split_cutoffs(weights)
    return (
        df.filter(b < c1),
        df.filter((b >= c1) & (b < c2)),
        df.filter(b >= c2),
    )


def split_label(
    id_col: str = "doc_id",
    weights: tuple[float, float, float] = (0.98, 0.01, 0.01),
    salt: str = "split",
    hash_fn: str = "xxhash64",
) -> F.Column:
    """The same 3-way membership as ``split_train_val_test``, as a LABEL
    column ('train'/'val'/'test') — for pipelines that carry the split as
    an attribute instead of three frames. Identical cutoffs, so the two
    forms never disagree."""
    b = _bucket(id_col, salt, hash_fn)
    c1, c2 = _split_cutoffs(weights)
    return (
        F.when(b < c1, F.lit("train"))
        .when(b < c2, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def gumbel_topk_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "gumbel",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the k rows
    maximizing log(w) + Gumbel noise — the Gumbel-top-k trick (sampling k
    items with probability proportional to their weights), which is exactly
    how DSIR draws its importance-resampled training subset
    (Xie et al. 2023 §3: weights from ``text.importance_weights``, then
    weighted sampling without replacement). The 'noise' is a deterministic
    hash-uniform of (salt, id) — same rows every run, any partitioning,
    and cross-engine reproducible with hash_fn='md5' (the same seam as
    ``hash_sample``).

    Scale shape: one narrow projection computes the key; the global top-k
    is orderBy+limit, which Spark plans as TakeOrderedAndProject — every
    partition keeps its local top-k and only k rows per partition reach
    the driver-side merge. No full sort, no full shuffle. Ties break on
    the id for determinism. Rows with weight <= 0 can never win (-inf key)
    but are filtered explicitly to keep NaN out of the ordering."""
    u = (_bucket(id_col, salt, hash_fn) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    key = F.log(F.col(weight_col)) + (-F.log(-F.log(u)))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__gumbel_key", key)
        .orderBy(F.col("__gumbel_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__gumbel_key")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    salt: str = "cap",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-group quota: keep at most `n` rows of each group,
    chosen by hash order (salt, id) — the "no single domain may exceed N
    documents" curation rule. Hash order (not ts/id order) makes the kept
    subset an unbiased sample of the group AND stable across runs and
    partitionings; ties on the hash break by id. One group-keyed window —
    the same shuffle any per-group rule needs; a celebrity group's rows
    all visit one reducer, so pair this with AQE skew split (on) when a
    group can exceed executor memory."""
    w = Window.partitionBy(group_col).orderBy(
        _bucket(id_col, salt, hash_fn).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def global_permutation(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "perm",
    hash_fn: str = "xxhash64",
    rank_col: str = "perm_rank",
) -> DataFrame:
    """Deterministic GLOBAL permutation rank in [0, n): the training-order
    shuffle a corpus gets before sharding (training loaders want documents
    in pseudo-random order, but the order must be REPRODUCIBLE — the same
    epoch-0 order on any cluster size, any partitioning, any rerun).
    Order = (hash bucket of (salt, id), id) — a new salt is a fresh
    epoch's permutation over the same corpus.

    Scale shape — a naive `row_number() OVER (ORDER BY …)` is a
    single-partition global sort, the one window shape this repo bans.
    Instead, the classic two-level rank: (1) per-bucket row counts →
    cumulative OFFSETS via a window over the BUCKET HISTOGRAM (≤ 1e6
    rows — bounded by the bucket space, NOT the data; a single-partition
    window over ≤1e6 16-byte rows is a driver-scale footnote at any
    corpus size), broadcast to executors; (2) within-bucket
    `row_number()` partitioned BY bucket — fully distributed, ~n/1e6
    rows per bucket. rank = offset + rn − 1. One corpus exchange (the
    bucket window; rows ride as payload, the key is the 8-byte bucket),
    one broadcast. Ranks are a bijection onto [0, n) because ties within
    a bucket break on the unique id."""
    withb = df.withColumn("__b", _bucket(id_col, salt, hash_fn))
    counts = withb.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    offsets = counts.select(
        "__b",
        (
            F.sum("__c").over(
                Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.col("__c")
        ).alias("__off"),
    )
    w = Window.partitionBy("__b").orderBy(F.col(id_col).asc())
    return (
        withb.join(F.broadcast(offsets), "__b")
        .withColumn(
            rank_col,
            (F.col("__off") + F.row_number().over(w) - F.lit(1)).cast("long"),
        )
        .drop("__b", "__off")
    )


def cluster_split_label(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    node_col: str = "node",
    comp_col: str = "component",
    weights: tuple[float, float, float] = (0.98, 0.01, 0.01),
    salt: str = "split",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Leak-proof split under NEAR-DUP clusters: split membership keys on
    the cluster's canonical id — `components` is the (node, component)
    output of ``dedup.connected_components`` over a near-dup pair graph;
    documents with no near-dup key on their own id — so a document and
    every near-duplicate of it land in the SAME split. Plain id-hash
    splits (``split_label``) silently leak near-dups across train/test:
    the classic eval-contamination bug this closes (the same reason
    decontamination pipelines dedup before splitting). Reduces exactly to
    ``split_label`` on a dup-free corpus, so the two can share cutoffs.

    Scale shape: one left equi-join on the id (components is one row per
    CLUSTERED doc — the near-dup minority — so AQE broadcasts it when
    small and shuffle-joins otherwise) + the same stateless bucket math as
    ``split_label``. Returns `df` plus a 'split' column."""
    comp = components.select(
        F.col(node_col).alias(id_col), F.col(comp_col).alias("__ck")
    )
    return (
        df.join(comp, id_col, "left")
        .withColumn("__sk", F.coalesce(F.col("__ck"), F.col(id_col)))
        .withColumn("split", split_label("__sk", weights, salt, hash_fn))
        .drop("__ck", "__sk")
    )


def water_fill_allocation(
    sources: DataFrame,
    total_budget: int,
    key_col: str = "source",
    weight_col: str = "weight",
    avail_col: str = "available",
    max_epochs: float = 1.0,
) -> DataFrame:
    """Token-budget ALLOCATION across sources by water-filling — the
    data-mixture planning step of assembling a training corpus (target
    mixture weights per source, e.g. DoReMi/Pile-style domain weights;
    the reference has no notion of budgets — SURVEY §2.4 extension):
    allocate `total_budget` tokens proportionally to `weight_col`,
    capped at each source's `avail_col`; the shortfall of undersupplied
    sources redistributes to the rest, still weight-proportionally —
    the exact water-filling solution, not a renormalize-and-clip
    approximation. Returns (key, weight, available, alloc) with
    Σ alloc = min(total_budget, Σ available) up to rounding.

    Closed form, no iteration: with sources sorted by r_i = avail_i/w_i
    (ties→key) and prefix sums (A_k, W_k), every candidate water level
    λ(k) = (T − A_k)/(W − W_k) is computed in one window pass and the
    true level is simply λ* = max_k λ(k) (capping a truly-capped source
    RAISES the level, over-capping lowers it — so the valid prefix is
    the argmax). alloc_i = least(avail_i, w_i·λ*), rounded to 6dp.

    `max_epochs` > 1 allows REPEATING scarce sources (the
    data-constrained scaling practice of running high-value sources for
    a few epochs): each source's effective supply becomes
    avail·max_epochs, so its allocation may exceed one pass over its
    data — alloc/available is then the source's epoch count. The
    default 1.0 never repeats.

    Scale shape: the sources table is a per-SOURCE aggregate (thousands
    of rows at web scale, never corpus-sized) — the global window sort
    is a driver-scale footnote; the corpus itself is only touched by
    whatever aggregate produced `avail_col`. Cross-engine parity note:
    prefix sums are frame-ordered (deterministic in any engine); the
    full-table Σw is not order-defined at float precision, so use
    dyadic/integer weights when bit-stable parity matters (integer
    `available` is exact in any order). Numerically the level is
    cancellation-robust (r12): W − W_k and its numerator twin compute as
    SUFFIX sums of positive terms, never total-minus-prefix — with
    weights spanning 1e-30..1e+30 the subtraction form cancels to 0 and
    silently breaks the Σalloc contract (caught by the adversarial
    property test in tests/test_properties.py, which pins this form
    against an exact-rational replay)."""
    if max_epochs <= 0:
        raise ValueError("water_fill_allocation: max_epochs must be > 0")
    if total_budget < 0:
        raise ValueError("water_fill_allocation: total_budget must be >= 0")
    # ADVICE r11: a zero/negative/null weight makes __r null (nulls sort
    # first in the prefix window) while the row's supply still counts in
    # __tot_a, silently breaking the water level and the
    # Σalloc = min(budget, Σavailable) contract — fail loudly instead.
    # +inf is rejected too (r12 review): it zeroes every candidate level
    # (eff/inf = 0, suffix sums inf) and inf*0 = NaN routes the whole
    # budget to the inf row via least()'s NaN-is-largest rule.
    # The guard stays IN-PLAN (raise_error fires on the executors when
    # the bad row is scanned): sources is a per-SOURCE aggregate, so no
    # extra driver job is worth spending on validation.
    wd = F.col(weight_col).cast("double")
    w_ok = F.when(
        wd.isNull() | (wd <= 0) | F.isnan(wd) | (wd == F.lit(float("inf"))),
        F.raise_error(
            F.concat(
                F.lit("water_fill_allocation: weight must be > 0; got "),
                F.coalesce(wd.cast("string"), F.lit("NULL")),
                F.lit(" for key "),
                F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")),
            )
        ).cast("double"),
    ).otherwise(wd)
    eff = (F.col(avail_col) * F.lit(float(max_epochs))).cast("double")
    s = sources.select(
        F.col(key_col),
        w_ok.alias("__w"),
        F.col(avail_col).cast("long").alias("__raw"),
        eff.alias("__a"),
        (eff / w_ok).cast("double").alias("__r"),
    )
    order = [F.col("__r").asc(), F.col(key_col).asc()]
    ww = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    # the candidate level λ(k) = (T − A_k)/(W − W_k) computes its
    # denominator as a SUFFIX sum, not total-minus-prefix: with weights
    # spanning wide magnitudes (1e-30..1e+30, the adversarial property
    # test), W − W_k cancels catastrophically in float — 1e16+1 − 1e16
    # is 0, the `> 0` guard then DROPS the true level candidate and the
    # Σalloc = min(budget, Σavailable) contract breaks, not just its low
    # bits. A suffix sum of all-positive terms never cancels. Same for
    # the numerator: T − A_k = min(budget − A_k, suffix_a) exactly
    # (min commutes with the subtraction), and suffix_a is robust when
    # the supply side dominates. Same sort, one extra frame — no
    # additional shuffle or pass over the per-source table.
    ws = Window.orderBy(*order).rowsBetween(1, Window.unboundedFollowing)
    wall = Window.partitionBy()
    c = s.select(
        "*",
        F.sum("__a").over(ww).alias("__cum_a"),
        F.sum("__a").over(ws).alias("__suf_a"),
        F.sum("__w").over(ws).alias("__suf_w"),
        F.sum("__a").over(wall).alias("__tot_a"),
        F.sum("__w").over(wall).alias("__tot_w"),
    )
    t = F.least(F.lit(float(total_budget)), F.col("__tot_a"))
    lam_rows = c.filter(F.col("__suf_w") > 0).agg(
        F.max(
            F.least(
                F.lit(float(total_budget)) - F.col("__cum_a"),
                F.col("__suf_a"),
            )
            / F.col("__suf_w")
        ).alias("__lam_rows")
    )
    base = c.select(
        "*", (t / F.col("__tot_w")).alias("__lam0")
    ).crossJoin(F.broadcast(lam_rows))  # 1-row level frame (exempt pattern)
    lam = F.greatest(F.col("__lam0"), F.coalesce(F.col("__lam_rows"), F.col("__lam0")))
    return base.select(
        F.col(key_col),
        F.col("__w").alias(weight_col),
        F.col("__raw").alias(avail_col),  # RAW supply; alloc may exceed it
        F.round(F.least(F.col("__a"), F.col("__w") * lam), 6).alias("alloc"),
    )  # when max_epochs > 1 — alloc/available is the source's epoch count


def budget_select(
    docs: DataFrame,
    allocations: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    alloc_col: str = "alloc",
    salt: str = "budget",
    hash_fn: str = "xxhash64",
    missing_sources: str = "drop",
) -> DataFrame:
    """Budget-EXACT document selection under a per-source token
    allocation (the execution half of `water_fill_allocation`): per
    source, admit documents in deterministic hash order (salt, id) while
    the running token total stays within the source's allocation; the
    first boundary-crossing document is dropped whole (truncation never
    splits a document — each source underfills by less than one doc).
    Hash order makes the kept prefix an unbiased sample of the source
    and stable across runs/partitionings (the `cap_per_group` rule, with
    a token budget instead of a row count).

    `missing_sources` governs documents whose source (including a NULL
    source) has NO allocation row — impossible when `allocations` comes
    from `water_fill_allocation` over the same corpus aggregate, but
    easy to hit with a hand-built allocation table (ADVICE r11):
    "drop" (default) silently discards them — the zero-allocation
    reading; "error" fails the job on the first such row, naming the
    offending source. There is no third mode: admitting unbudgeted
    sources would break the Σ tokens ≤ Σ alloc contract.

    A MATCHED allocation row carrying a NULL `alloc_col` value raises in
    BOTH modes (ADVICE r12): it is a malformed allocation table, not a
    missing allocation — before this guard, "error" mode blamed it on a
    "no allocation row" that plainly existed, and "drop" mode silently
    dropped the whole source through `cum_tokens <= NULL`. The two modes
    still differ only on docs with NO allocation row.

    One group-keyed window over the corpus (the same shuffle any
    per-group rule needs) + a broadcast join of the per-source
    allocation table. Returns the admitted (id, source, n_tokens,
    cum_tokens) rows."""
    if missing_sources not in ("drop", "error"):
        raise ValueError("budget_select: missing_sources must be 'drop' or 'error'")
    w = Window.partitionBy(source_col).orderBy(
        _bucket(id_col, salt, hash_fn).asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    # __has_alloc marks "a row matched" independently of the alloc VALUE,
    # so a missing row and a NULL alloc value raise different errors
    alloc = F.broadcast(
        allocations.select(source_col, alloc_col, F.lit(True).alias("__has_alloc"))
    )
    src_name = F.coalesce(docs[source_col].cast("string"), F.lit("NULL"))
    null_alloc_guard = F.raise_error(
        F.concat(
            F.lit("budget_select: allocation row for source "),
            src_name,
            F.lit(f" carries a NULL {alloc_col} value (malformed allocation table)"),
        )
    ).cast("double")
    if missing_sources == "error":
        # left join + in-plan raise: the unmatched row itself carries the
        # error, so the guard costs no extra job and no extra shuffle
        joined = docs.join(alloc, docs[source_col].eqNullSafe(alloc[source_col]), "left")
        guard = (
            F.when(
                alloc["__has_alloc"].isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("budget_select: no allocation row for source "),
                        src_name,
                    )
                ).cast("double"),
            )
            .when(alloc[alloc_col].isNull(), null_alloc_guard)
            .otherwise(alloc[alloc_col])
        )
        joined = joined.select(
            docs["*"], guard.alias("__alloc")
        )
    else:
        # null-safe like the error mode (r12 review): a NULL-source doc
        # whose allocation table carries a NULL-keyed row HAS a budget —
        # the two modes must only differ on docs with NO allocation row
        joined = docs.join(
            alloc, docs[source_col].eqNullSafe(alloc[source_col])
        ).select(
            docs["*"],
            F.when(alloc[alloc_col].isNull(), null_alloc_guard)
            .otherwise(alloc[alloc_col])
            .alias("__alloc"),
        )
    # EXACT boundary compare (VERDICT r12 item 3 — the property pattern
    # found the same float seam the water fill had): `cum_tokens` is a
    # long, so a raw long<=double filter silently rounds cum to the
    # nearest double first — at cum > 2^53 that admitted a boundary doc
    # whose exact total EXCEEDED the allocation (measured: alloc = 2^53,
    # cum = 2^53+1 rounds to 2^53 and passes). Since cum is integral,
    # cum <= alloc  <=>  cum <= floor(alloc), and floor(double) -> long
    # is exact; allocations at/above 2^63 (no long can exceed them) skip
    # the floor so ANSI mode's overflow guard never fires on them.
    limit = F.when(
        F.col("__alloc") >= F.lit(float(2**63)), F.lit(2**63 - 1).cast("long")
    ).otherwise(F.floor(F.col("__alloc")).cast("long"))
    return (
        joined.withColumn("cum_tokens", F.sum(tokens_col).over(w).cast("long"))
        .filter(F.col("cum_tokens") <= limit)
        .select(id_col, source_col, F.col(tokens_col).cast("long").alias(tokens_col), "cum_tokens")
    )
