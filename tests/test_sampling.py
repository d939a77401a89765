"""Deterministic sampling/split operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_twitter_big_data_pipeline_spark.operators import sampling


def _docs(spark, n=2000):
    return spark.createDataFrame([(i, f"doc {i}") for i in range(n)], ["doc_id", "text"])


def test_hash_sample_deterministic_and_sized(spark):
    df = _docs(spark)
    s1 = sorted(r.doc_id for r in sampling.hash_sample(df, 0.1).collect())
    s2 = sorted(r.doc_id for r in sampling.hash_sample(df, 0.1).collect())
    assert s1 == s2                      # same rows every run
    assert 140 <= len(s1) <= 260         # ~10% of 2000
    # repartitioning must not change membership (the df.sample() failure mode)
    s3 = sorted(r.doc_id for r in sampling.hash_sample(df.repartition(7), 0.1).collect())
    assert s1 == s3


def test_hash_sample_salts_decorrelate(spark):
    df = _docs(spark)
    a = {r.doc_id for r in sampling.hash_sample(df, 0.1, salt="a").collect()}
    b = {r.doc_id for r in sampling.hash_sample(df, 0.1, salt="b").collect()}
    # independent 10% samples overlap ~1% (20 rows), not 100%
    assert len(a & b) < len(a) / 2


def test_hash_sample_nested_fractions(spark):
    df = _docs(spark)
    big = {r.doc_id for r in sampling.hash_sample(df, 0.2).collect()}
    small = {r.doc_id for r in sampling.hash_sample(df, 0.1).collect()}
    assert small <= big  # same salt ⇒ fractions nest (bucket < c is monotone)


def test_stratified_sample(spark):
    rows = [(i, "en" if i % 10 else "mi") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.stratified_sample(df, "lang", {"mi": 1.0, "en": 0.05})
    got = [r.lang for r in out.collect()]
    assert got.count("mi") == 100        # rare stratum kept whole
    assert 20 <= got.count("en") <= 80   # ~5% of 900


def test_split_disjoint_exhaustive_stable(spark):
    df = _docs(spark)
    tr, va, te = sampling.split_train_val_test(df, (0.8, 0.1, 0.1))
    tr_ids = {r.doc_id for r in tr.collect()}
    va_ids = {r.doc_id for r in va.collect()}
    te_ids = {r.doc_id for r in te.collect()}
    assert not (tr_ids & va_ids) and not (tr_ids & te_ids) and not (va_ids & te_ids)
    assert len(tr_ids) + len(va_ids) + len(te_ids) == 2000
    # growing the corpus keeps existing rows in their splits
    bigger = _docs(spark, 3000)
    tr2, va2, te2 = sampling.split_train_val_test(bigger, (0.8, 0.1, 0.1))
    assert va_ids <= {r.doc_id for r in va2.collect()}
    assert te_ids <= {r.doc_id for r in te2.collect()}


def test_mix_sources_epoch_weights(spark):
    rows = [(i, ["wiki", "cc", "junk"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.mix_sources(df, {"wiki": 2.5, "cc": 0.25, "junk": 0.0})
    got = out.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    assert "junk" not in counts                 # weight 0 drops the source
    assert 2300 <= counts["wiki"] <= 2700       # 1000 docs x ~2.5
    assert 150 <= counts["cc"] <= 350           # 1000 docs x ~0.25
    # whole epochs replicate EVERY doc: each wiki doc appears >= 2x
    per_doc = out.filter(out.source == "wiki").groupBy("doc_id").count()
    assert per_doc.filter(per_doc["count"] < 2).count() == 0
    # repeat_idx enumerates copies 1..n
    top = out.filter(out.source == "wiki").groupBy("doc_id").agg(
        F.max("repeat_idx").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    assert top.filter(F.col("mx") != F.col("n")).count() == 0


def test_mix_sources_deterministic_and_validates(spark):
    rows = [(i, "a") for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = sorted((r.doc_id, r.repeat_idx) for r in sampling.mix_sources(df, {"a": 1.5}).collect())
    b = sorted(
        (r.doc_id, r.repeat_idx)
        for r in sampling.mix_sources(df.repartition(13), {"a": 1.5}).collect()
    )
    assert a == b  # membership independent of partitioning
    with pytest.raises(ValueError):
        sampling.mix_sources(df, {"a": -1.0})


def test_temperature_weights_properties(spark):
    """alpha=1 is the identity mix; alpha=0 equalizes sources; any alpha
    preserves the expected corpus size; alpha<1 moves weight from the head
    source to the tail source."""
    from reddit_twitter_big_data_pipeline_spark.operators import sampling

    rows = [(i, "big") for i in range(90)] + [(1000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    assert sampling.temperature_weights(df, alpha=1.0) == {"big": 1.0, "small": 1.0}

    w0 = sampling.temperature_weights(df, alpha=0.0)
    # equal expected share: 50 docs from each source
    assert abs(90 * w0["big"] - 50) < 1e-6 and abs(10 * w0["small"] - 50) < 1e-6

    w5 = sampling.temperature_weights(df, alpha=0.5)
    assert abs(90 * w5["big"] + 10 * w5["small"] - 100) < 1e-6  # size preserved
    assert w5["big"] < 1.0 < w5["small"]  # tail upsampled, head downsampled

    w_scaled = sampling.temperature_weights(df, alpha=0.5, target_total=300)
    assert abs(90 * w_scaled["big"] + 10 * w_scaled["small"] - 300) < 1e-6

    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        sampling.temperature_weights(df, alpha=-1)


def test_cap_per_group_binds_and_is_partition_stable(spark):
    from reddit_twitter_big_data_pipeline_spark.operators import sampling

    rows = [(i, "big") for i in range(40)] + [(100 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.cap_per_group(df, "source", 10)
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_src["big"]) == 10      # quota binds
    assert len(by_src["tiny"]) == 3      # under-quota group untouched
    # repartitioning must not change membership (hash order, not row order)
    again = {r.doc_id for r in sampling.cap_per_group(df.repartition(7), "source", 10).collect()
             if r.source == "big"}
    assert again == by_src["big"]


def test_cluster_split_label_keeps_near_dups_together(spark):
    """Leak-proof property: every near-dup pair shares a split label
    (id-hash split_label does NOT guarantee this — the bug being closed);
    documents with no near-dup get exactly their plain split_label."""
    from reddit_twitter_big_data_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"unique document number {i} about topic {i % 7} words") for i in range(200)]
        + [(1000 + i, f"unique document number {i} about topic {i % 7} words") for i in range(200)],
        ["doc_id", "text"],
    )
    pairs = dedup.jaccard_pairs(docs, threshold=0.9)
    comp = dedup.connected_components(pairs)
    out = sampling.cluster_split_label(
        docs.select("doc_id"), comp, weights=(0.6, 0.2, 0.2)
    )
    labels = {r.doc_id: r.split for r in out.collect()}
    assert len(labels) == 400
    for r in pairs.collect():
        assert labels[r.a] == labels[r.b], f"pair ({r.a},{r.b}) split across sets"
    # with 3 splits at 60/20/20, 200 independent id-hash pairs would
    # certainly disagree somewhere — confirm the plain split DOES leak
    # (i.e. the operator is not vacuously passing)
    plain = docs.select("doc_id", sampling.split_label("doc_id", (0.6, 0.2, 0.2)).alias("split"))
    plain_labels = {r.doc_id: r.split for r in plain.collect()}
    assert any(
        plain_labels[r.a] != plain_labels[r.b] for r in pairs.collect()
    ), "fixture too small to demonstrate the leak"
    # singletons (no near-dup) reduce to split_label on their own id
    clustered_ids = {r.node for r in comp.collect()}
    for i, s in labels.items():
        if i not in clustered_ids:
            assert s == plain_labels[i]


def test_global_permutation_bijection_and_stability(spark):
    docs = spark.createDataFrame([(i,) for i in range(257)], ["doc_id"])
    out = sampling.global_permutation(docs, hash_fn="md5")
    rows = {r.doc_id: r.perm_rank for r in out.collect()}
    # bijection onto [0, n)
    assert sorted(rows.values()) == list(range(257))
    # partitioning-independent: a different physical layout yields the
    # SAME permutation (the reproducible-epoch-order contract)
    rows7 = {
        r.doc_id: r.perm_rank
        for r in sampling.global_permutation(
            docs.repartition(7), hash_fn="md5"
        ).collect()
    }
    assert rows7 == rows
    # a different salt is a genuinely different epoch order
    rows_e1 = {
        r.doc_id: r.perm_rank
        for r in sampling.global_permutation(
            docs, salt="epoch1", hash_fn="md5"
        ).collect()
    }
    assert sorted(rows_e1.values()) == list(range(257))
    assert rows_e1 != rows
    # order matches the semantic spec: rank sorts by (bucket, id)
    import hashlib

    def bucket(i):
        return int(hashlib.md5(f"perm{i}".encode()).hexdigest()[:15], 16) % 1_000_000

    want = [i for i, _ in sorted(((i, bucket(i)) for i in range(257)), key=lambda t: (t[1], t[0]))]
    got = [doc for doc, _ in sorted(rows.items(), key=lambda t: t[1])]
    assert got == want


def test_global_permutation_bijection_at_scale(spark):
    # 100k rows through the two-level rank: still a bijection onto
    # [0, n) — one aggregate checks it without collecting rows
    from pyspark.sql import functions as F

    n = 100_000
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    out = sampling.global_permutation(docs)
    row = out.agg(
        F.countDistinct("perm_rank").alias("d"),
        F.min("perm_rank").alias("lo"),
        F.max("perm_rank").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (row.d, row.lo, row.hi, row.n) == (n, 0, n - 1, n)


# --------------------------------------------- water-fill budget allocation


def _brute_water_fill(items, total):
    """Iterative reference: repeatedly cap sources below the water level."""
    t = min(total, sum(a for _, _, a in items))
    capped: dict = {}
    uncapped = {k: (w, a) for k, w, a in items}
    lam = 0.0
    while True:
        wsum = sum(w for w, _ in uncapped.values())
        if wsum == 0:
            break
        lam = (t - sum(capped.values())) / wsum
        newly = [k for k, (w, a) in uncapped.items() if a < w * lam]
        if not newly:
            break
        for k in newly:
            capped[k] = uncapped.pop(k)[1]
    return {
        k: (capped[k] if k in capped else uncapped[k][0] * lam)
        for k, _, _ in items
    }


def test_water_fill_matches_iterative_reference(spark):
    items = [
        ("web", 8.0, 100_000),   # oversupplied
        ("code", 4.0, 10_000),   # undersupplied -> capped
        ("books", 2.0, 2_000),   # deeply undersupplied -> capped
        ("wiki", 1.0, 50_000),   # oversupplied
    ]
    src = spark.createDataFrame(items, ["source", "weight", "available"])
    got = {
        r.source: r.alloc
        for r in sampling.water_fill_allocation(src, 60_000).collect()
    }
    want = _brute_water_fill(items, 60_000)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-4, (k, got[k], want[k])
    assert abs(sum(got.values()) - 60_000) < 1e-3  # budget fully spent


def test_water_fill_budget_exceeds_supply(spark):
    # budget >= total supply: everyone gets exactly their availability
    items = [("a", 1.0, 100), ("b", 3.0, 50)]
    src = spark.createDataFrame(items, ["source", "weight", "available"])
    got = {
        r.source: r.alloc
        for r in sampling.water_fill_allocation(src, 10_000).collect()
    }
    assert got == {"a": 100.0, "b": 50.0}


def test_water_fill_single_source_and_zero_budget(spark):
    src = spark.createDataFrame([("only", 2.0, 500)], ["source", "weight", "available"])
    assert sampling.water_fill_allocation(src, 200).collect()[0].alloc == 200.0
    assert sampling.water_fill_allocation(src, 0).collect()[0].alloc == 0.0


def test_budget_select_prefix_and_boundary(spark):
    # alloc 10 tokens for s1: hash-ordered docs admit while cum <= 10;
    # the crossing doc drops whole. s2 has no allocation row -> dropped.
    docs = spark.createDataFrame(
        [(i, "s1", 4) for i in range(1, 6)] + [(10, "s2", 1)],
        ["doc_id", "source", "n_tokens"],
    )
    alloc = spark.createDataFrame([("s1", 10.0)], ["source", "alloc"])
    rows = sampling.budget_select(docs, alloc).collect()
    assert all(r.cum_tokens <= 10 for r in rows)
    assert len(rows) == 2  # 4+4 <= 10, third crosses
    # kept set = the 2 smallest in (bucket, id) hash order — recompute
    got_ids = {r.doc_id for r in rows}
    hash_order = [
        r.doc_id
        for r in docs.filter("source = 's1'")
        .select("doc_id", sampling._bucket("doc_id", "budget").alias("b"))
        .orderBy("b", "doc_id")
        .collect()
    ]
    assert got_ids == set(hash_order[:2])


def test_water_fill_max_epochs_repeats_scarce_sources(spark):
    # code (weight 4, supply 10k) is scarce: with max_epochs=4 its
    # effective supply is 40k, so it can absorb its full weight share;
    # alloc/available > 1 is the epoch count. Reference check vs the
    # iterative brute force on the effective supplies.
    items = [("web", 8.0, 100_000), ("code", 4.0, 10_000)]
    src = spark.createDataFrame(items, ["source", "weight", "available"])
    got = {
        r.source: (r.available, r.alloc)
        for r in sampling.water_fill_allocation(src, 60_000, max_epochs=4.0).collect()
    }
    eff = [(k, w, a * 4) for k, w, a in items]
    want = _brute_water_fill(eff, 60_000)
    for k, (avail_raw, alloc) in got.items():
        assert abs(alloc - want[k]) < 1e-4
    assert got["code"][0] == 10_000         # 'available' stays the RAW supply
    assert got["code"][1] / got["code"][0] == pytest.approx(2.0)  # 2 epochs
    assert abs(sum(a for _, a in got.values()) - 60_000) < 1e-3
    with pytest.raises(ValueError):
        sampling.water_fill_allocation(src, 10, max_epochs=0)


def test_water_fill_rejects_negative_budget(spark):
    src = spark.createDataFrame([("a", 1.0, 10)], ["source", "weight", "available"])
    with pytest.raises(ValueError, match="total_budget"):
        sampling.water_fill_allocation(src, -5)


def test_water_fill_rejects_nonpositive_weights(spark):
    # ADVICE r11 (+r12 review): a weight <= 0 / null / NaN used to make
    # __r null — nulls sort first in the prefix window while the row's
    # supply still counted in __tot_a — and +inf zeroed every candidate
    # level then routed the whole budget to the inf row via
    # least()'s NaN-is-largest rule; both silently broke the water
    # level. The in-plan guard now fails the job loudly.
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    for bad_w in (0.0, -2.0, None, float("nan"), float("inf")):
        src = spark.createDataFrame(
            [("good", 1.0, 100), ("bad", bad_w, 50)],
            "source string, weight double, available long",
        )
        with pytest.raises(SparkRuntimeException, match="weight must be > 0"):
            sampling.water_fill_allocation(src, 60).collect()
    # all-positive weights still work untouched
    src = spark.createDataFrame(
        [("a", 1.0, 100), ("b", 3.0, 50)], ["source", "weight", "available"]
    )
    got = {r.source: r.alloc for r in sampling.water_fill_allocation(src, 10_000).collect()}
    assert got == {"a": 100.0, "b": 50.0}


def test_budget_select_missing_sources_modes(spark):
    # ADVICE r11: docs whose source has no allocation row are silently
    # dropped by default (inner join = zero allocation); 'error' mode
    # fails the job naming the source instead — including a NULL source.
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs = spark.createDataFrame(
        [(1, "s1", 4), (2, "s1", 4), (10, "s2", 1)],
        "doc_id long, source string, n_tokens long",
    )
    alloc = spark.createDataFrame([("s1", 10.0)], ["source", "alloc"])
    kept = sampling.budget_select(docs, alloc).collect()  # default: drop
    assert {r.source for r in kept} == {"s1"}
    with pytest.raises(SparkRuntimeException, match="no allocation row for source s2"):
        sampling.budget_select(docs, alloc, missing_sources="error").collect()
    # error mode passes when every source (incl. NULL) is budgeted
    docs_null = spark.createDataFrame(
        [(1, "s1", 4), (2, None, 4)], "doc_id long, source string, n_tokens long"
    )
    alloc_null = spark.createDataFrame(
        [("s1", 10.0), (None, 10.0)], "source string, alloc double"
    )
    rows = sampling.budget_select(docs_null, alloc_null, missing_sources="error").collect()
    assert len(rows) == 2
    # r12 review: drop mode is null-safe too — a NULL-source doc whose
    # allocation table has a NULL-keyed row HAS a budget; the modes
    # differ only on docs with NO allocation row
    rows_drop = sampling.budget_select(docs_null, alloc_null).collect()
    assert sorted(r.doc_id for r in rows_drop) == [1, 2]
    with pytest.raises(ValueError, match="missing_sources"):
        sampling.budget_select(docs, alloc, missing_sources="admit")


def test_budget_select_null_alloc_value_raises_in_both_modes(spark):
    """ADVICE r12: a MATCHED allocation row carrying a NULL alloc value is
    a malformed allocation table, distinct from a missing row — before
    this guard, 'error' mode blamed a 'no allocation row' that existed
    and 'drop' mode silently dropped the source via cum_tokens <= NULL.
    Both modes now raise naming the real defect."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs = spark.createDataFrame(
        [(1, "s1", 4), (2, "s2", 4)], "doc_id long, source string, n_tokens long"
    )
    alloc = spark.createDataFrame(
        [("s1", 10.0), ("s2", None)], "source string, alloc double"
    )
    for mode in ("drop", "error"):
        with pytest.raises(
            SparkRuntimeException,
            match="allocation row for source s2 carries a NULL alloc value",
        ):
            sampling.budget_select(docs, alloc, missing_sources=mode).collect()
    # healthy rows are untouched: dropping the malformed source row
    # restores both modes (s2 then has NO row: dropped / named)
    ok = alloc.filter("source = 's1'")
    kept = sampling.budget_select(docs, ok).collect()
    assert {r.source for r in kept} == {"s1"}
    with pytest.raises(SparkRuntimeException, match="no allocation row for source s2"):
        sampling.budget_select(docs, ok, missing_sources="error").collect()
