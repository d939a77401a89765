"""Tests for round-2 hardening: atomic merge_upsert, the batched graph
sink, enrichment failure modes, and the rate-limited ingest connectors."""

from __future__ import annotations

import glob
import json
import os
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from reddit_twitter_big_data_pipeline_spark.functions import enrich
from reddit_twitter_big_data_pipeline_spark.sinks import graph_sink, writers
from reddit_twitter_big_data_pipeline_spark.sources import ingest


# --- merge_upsert atomicity -------------------------------------------------


def test_merge_upsert_crash_before_swap_preserves_target(spark, tmp_path, monkeypatch):
    target = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "old"), (2, "old")], ["k", "v"]).write.parquet(target)

    def boom(*a, **kw):
        raise RuntimeError("simulated crash between staging write and swap")

    monkeypatch.setattr(writers, "_swap_into_place", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        writers.merge_upsert(
            spark, target, spark.createDataFrame([(2, "new")], ["k", "v"]), ["k"]
        )
    # old table fully intact; merged result parked in staging
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "old", 2: "old"}
    staged = {r.k: r.v for r in spark.read.parquet(target + ".__staging__").collect()}
    assert staged == {1: "old", 2: "new"}


def test_merge_upsert_recovers_after_crash(spark, tmp_path, monkeypatch):
    target = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "old")], ["k", "v"]).write.parquet(target)
    monkeypatch.setattr(writers, "_swap_into_place", lambda *a: (_ for _ in ()).throw(IOError("x")))
    with pytest.raises(IOError):
        writers.merge_upsert(spark, target, spark.createDataFrame([(2, "n")], ["k", "v"]), ["k"])
    monkeypatch.undo()
    # rerun over stale staging/backup leftovers must converge
    out = writers.merge_upsert(
        spark, target, spark.createDataFrame([(2, "n")], ["k", "v"]), ["k"]
    )
    assert {r.k: r.v for r in out.collect()} == {1: "old", 2: "n"}
    assert not os.path.exists(target + ".__backup__")


# --- graph sink -------------------------------------------------------------


def _recording_transport(out_dir: str):
    """Executor-side transport that appends each (statement, rows) call to a
    uniquely-named JSONL file (executors are separate processes — a list in
    the test process would stay empty)."""

    def factory():
        def send(statement, rows):
            p = os.path.join(out_dir, f"{uuid.uuid4().hex}.json")
            with open(p, "w") as f:
                json.dump({"statement": statement, "rows": rows}, f)

        return send

    return factory


def _replay(calls):
    """Apply recorded MERGE statements to a dict-store with real MERGE
    (create-or-match) semantics."""
    nodes, edges = {}, set()
    for c in calls:
        stmt = c["statement"]
        if stmt.startswith("UNWIND $rows AS row MERGE (n:"):
            label = stmt.split("MERGE (n:")[1].split(" ")[0]
            for r in c["rows"]:
                nodes[(label, r["node_id"])] = r["props"]
        else:
            rel = stmt.split("MERGE (a)-[r:")[1].split("]")[0]
            for r in c["rows"]:
                edges.add((r["src"], rel, r["dst"]))
    return nodes, edges


def test_graph_sink_batched_idempotent(spark, tmp_path):
    nodes = spark.createDataFrame(
        [(f"u{i}", "User", {"name": f"n{i}"}) for i in range(7)],
        "node_id string, label string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(f"u{i}", f"u{(i + 1) % 7}", "FOLLOWS") for i in range(7)],
        "src string, dst string, rel_type string",
    )
    d1 = str(tmp_path / "one")
    os.makedirs(d1)
    graph_sink.write_graph(nodes, edges, _recording_transport(d1), batch_size=3)
    calls = [json.load(open(p)) for p in glob.glob(d1 + "/*.json")]
    assert all(len(c["rows"]) <= 3 for c in calls)  # batch_size respected
    store1 = _replay(calls)
    assert len(store1[0]) == 7 and len(store1[1]) == 7

    # replay the whole write a second time → MERGE converges, no duplicates
    graph_sink.write_graph(nodes, edges, _recording_transport(d1), batch_size=3)
    calls2 = [json.load(open(p)) for p in glob.glob(d1 + "/*.json")]
    assert _replay(calls2) == store1


def test_graph_sink_retries_transient(spark, tmp_path):
    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)
    ok_dir = str(tmp_path / "ok")
    os.makedirs(ok_dir)

    # capture the CLASS, not the module: `graph_sink.TransientSinkError`
    # inside the closure would pickle the module by reference and executors
    # launched from a non-repo cwd cannot import the package
    transient_error = graph_sink.TransientSinkError

    def factory():
        def send(statement, rows):
            # fail the first attempt per batch (marker keyed on batch content)
            key = str(abs(hash(json.dumps(rows, sort_keys=True))))
            marker = os.path.join(marker_dir, key)
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise transient_error("throttled")
            with open(os.path.join(ok_dir, f"{uuid.uuid4().hex}.json"), "w") as f:
                json.dump(rows, f)

        return send

    nodes = spark.createDataFrame(
        [("a", "User", {}), ("b", "User", {})],
        "node_id string, label string, props map<string,string>",
    ).repartition(1)
    graph_sink.write_nodes(nodes, factory, batch_size=10, backoff_s=0.0)
    written = [json.load(open(p)) for p in glob.glob(ok_dir + "/*.json")]
    assert sorted(r["node_id"] for c in written for r in c) == ["a", "b"]


# --- enrichment failure modes ----------------------------------------------


def test_retrying_backend_transient_then_success():
    attempts = []

    def flaky(texts: pd.Series) -> pd.Series:
        attempts.append(len(texts))
        if len(attempts) < 3:
            raise enrich.TransientEnrichError("429")
        return texts.str.upper()

    slept = []
    wrapped = enrich.retrying_backend(flaky, max_retries=3, sleep=slept.append)
    out = wrapped(pd.Series(["a", "b"]))
    assert list(out) == ["A", "B"]
    assert len(attempts) == 3 and len(slept) == 2  # two backoffs before success


def test_retrying_backend_poison_item_salvages_batch():
    def poison(texts: pd.Series) -> pd.Series:
        if texts.str.contains("bad").any():
            raise enrich.TransientEnrichError("always fails")
        return texts.str.len().astype("object")

    wrapped = enrich.retrying_backend(poison, max_retries=1, sleep=lambda s: None)
    out = wrapped(pd.Series(["ok", "bad", "fine"], index=[10, 11, 12]))
    assert list(out.index) == [10, 11, 12]
    assert out.loc[10] == 2 and out.loc[12] == 4
    assert out.loc[11] is None  # null-on-error, rest of batch kept


def test_retrying_backend_dataframe_all_fail_shape():
    def always(texts: pd.Series) -> pd.DataFrame:
        raise enrich.TransientEnrichError("dead API")

    wrapped = enrich.retrying_backend(
        always, max_retries=0, sleep=lambda s: None,
        null_columns=["Positive", "Negative", "Neutral", "Mixed"],
    )
    out = wrapped(pd.Series(["x", "y"]))
    assert list(out.columns) == ["Positive", "Negative", "Neutral", "Mixed"]
    assert len(out) == 2 and out.isna().all().all()


def test_retrying_backend_through_spark(spark):
    # capture class/function, not the `enrich` module — a module reference in
    # the closure pickles by name and breaks executors launched off-repo-cwd
    transient_error = enrich.TransientEnrichError
    claim_keyword = enrich.claim_keyword

    def flaky_claim(texts: pd.Series) -> pd.Series:
        if texts.str.contains("poison").any():
            raise transient_error("throttle")
        return claim_keyword(texts)

    old = enrich.BACKENDS["claim"]
    try:
        enrich.set_backend(
            "claim", enrich.retrying_backend(flaky_claim, max_retries=1, sleep=lambda s: None)
        )
        df = spark.createDataFrame(
            [(1, "official data report"), (2, "poison pill"), (3, "nothing")], ["id", "t"]
        ).repartition(1)
        got = {r.id: r.c for r in df.select("id", enrich.claim_udf()(F.col("t")).alias("c")).collect()}
        assert got[1] == 1.0 and got[3] == 0.0
        assert got[2] is None  # poison row degraded to null, batch survived
    finally:
        enrich.set_backend("claim", old)


# --- ingest connectors ------------------------------------------------------


def test_rate_limiter_waits_for_window_to_clear():
    t = {"now": 0.0}
    waits = []
    rl = ingest.RateLimiter(rate=2, per_s=1.0, clock=lambda: t["now"], sleeper=waits.append)
    rl.acquire()
    rl.acquire()  # window full (2 calls at t=0)
    rl.acquire()  # must wait until the oldest call leaves the 1s window
    assert len(waits) == 1 and abs(waits[0] - 1.0) < 1e-6
    t["now"] += 10.0  # window long since cleared
    rl.acquire()
    assert len(waits) == 1


def test_fetch_topics_roundtrip(spark):
    def factory():
        def fetch(topic, since, until):
            return [
                {"id": f"{topic}-1", "content": f"about {topic}", "since": since},
                {"id": f"{topic}-2", "content": f"more {topic}", "since": since},
            ]

        return fetch

    raw = ingest.fetch_topics(
        spark, ["ukraine", "climate"], factory, "2024-01-01", "2024-01-02", api_slots=2
    )
    parsed = ingest.parse_payload(raw, "id string, content string, since string")
    rows = {r.id: r for r in parsed.collect()}
    assert set(rows) == {"ukraine-1", "ukraine-2", "climate-1", "climate-2"}
    assert rows["climate-1"].topic == "climate"
    assert rows["ukraine-2"].since == "2024-01-01"


def test_refetch_by_ids_batches(spark):
    def factory():
        def fetch_ids(chunk):
            # one record per id, tagged with the chunk it arrived in
            return [{"id": i, "n_in_batch": len(chunk)} for i in chunk]

        return fetch_ids

    ids = spark.createDataFrame([(i,) for i in range(60)], ["id"]).repartition(1)
    raw = ingest.refetch_by_ids(ids, factory, batch_size=25)
    parsed = ingest.parse_payload(raw, "id long, n_in_batch int")
    sizes = [r.n_in_batch for r in parsed.collect()]
    assert len(sizes) == 60 and max(sizes) <= 25
    assert sorted(set(sizes)) == [10, 25]  # 60 = 25 + 25 + 10


def test_refetch_merges_into_target(spark, tmp_path):
    target = str(tmp_path / "posts")
    spark.createDataFrame([(1, 5), (2, 5)], ["id", "score"]).write.parquet(target)

    def factory():
        def fetch_ids(chunk):
            return [{"id": i, "score": 99} for i in chunk]

        return fetch_ids

    ids = spark.createDataFrame([(2,)], ["id"])
    raw = ingest.refetch_by_ids(ids, factory)
    updates = ingest.parse_payload(raw, "id long, score int").drop("topic")
    out = writers.merge_upsert(spark, target, updates, ["id"])
    assert {r.id: r.score for r in out.collect()} == {1: 5, 2: 99}


# --- bucketed co-located joins ----------------------------------------------


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import pyspark.sql.functions as SF

    orders = spark.range(0, 1000).select(
        SF.col("id").alias("o_id"), (SF.col("id") % 7).alias("prio")
    )
    lines = spark.range(0, 5000).select(
        (SF.col("id") % 1000).alias("l_oid"), SF.col("id").alias("line_id")
    )
    writers.write_bucketed(
        orders, "t_orders_b", ["o_id"], n_buckets=8,
        sort_cols=["o_id"], path=str(tmp_path / "ob"),
    )
    writers.write_bucketed(
        lines, "t_lines_b", ["l_oid"], n_buckets=8,
        sort_cols=["l_oid"], path=str(tmp_path / "lb"),
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (tiny test tables would broadcast, which
        # hides the property under test: bucketing removes the join shuffle)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("t_orders_b")
        b = spark.table("t_lines_b")
        joined = a.join(b, a.o_id == b.l_oid)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # both sides pre-bucketed
        assert "Bucketed: true" in plan
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lines_b")


def test_merge_upsert_recovers_interrupted_swap(spark, tmp_path):
    """Crash BETWEEN the swap's two renames (target gone, backup is the only
    copy) must not be mistaken for a first write — the next merge_upsert
    restores the backup before reading (the review-found data-loss path)."""
    target = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "old"), (2, "old")], ["k", "v"]).write.parquet(target)
    # simulate the mid-swap crash state: rename(tgt, backup) done, promote not
    os.rename(target, target + ".__backup__")
    out = writers.merge_upsert(
        spark, target, spark.createDataFrame([(2, "new")], ["k", "v"]), ["k"]
    )
    assert {r.k: r.v for r in out.collect()} == {1: "old", 2: "new"}
    assert not os.path.exists(target + ".__backup__")


def test_retrying_backend_learns_dataframe_shape():
    """A DataFrame backend with NO null_columns: after one successful call the
    wrapper must emit DataFrame-shaped nulls during a later full outage."""
    calls = {"n": 0}

    def backend(texts: pd.Series) -> pd.DataFrame:
        calls["n"] += 1
        if calls["n"] > 1:
            raise enrich.TransientEnrichError("outage")
        return pd.DataFrame({"a": [1.0] * len(texts), "b": [2.0] * len(texts)}, index=texts.index)

    wrapped = enrich.retrying_backend(backend, max_retries=0, sleep=lambda s: None)
    first = wrapped(pd.Series(["x"]))
    assert isinstance(first, pd.DataFrame)
    out = wrapped(pd.Series(["y", "z"], index=[5, 6]))
    assert isinstance(out, pd.DataFrame)
    assert list(out.columns) == ["a", "b"]
    assert list(out.index) == [5, 6] and out.isna().all().all()


def test_retrying_backend_empty_batch_with_failing_fn():
    def always(texts: pd.Series) -> pd.Series:
        raise enrich.TransientEnrichError("dead")

    wrapped = enrich.retrying_backend(always, max_retries=0, sleep=lambda s: None)
    out = wrapped(pd.Series([], dtype="object"))
    assert len(out) == 0


def test_rate_limited_backend_composes_with_retry():
    """The full reference operating mode: throttled calls, retried on
    transient failure, each retry also passing through the limiter."""
    t = {"now": 0.0}
    waits = []

    def advance(s):
        waits.append(s)
        t["now"] += s

    calls = {"n": 0}

    def flaky(texts: pd.Series) -> pd.Series:
        calls["n"] += 1
        if calls["n"] == 1:
            raise enrich.TransientEnrichError("429")
        return texts.str.upper()

    throttled = enrich.rate_limited_backend(
        flaky, rate=2, per_s=1.0, clock=lambda: t["now"], sleeper=advance
    )
    wrapped = enrich.retrying_backend(throttled, max_retries=2, sleep=lambda s: None)
    out = wrapped(pd.Series(["a"]))
    assert list(out) == ["A"]
    assert calls["n"] == 2  # one failure, one retried success
    # third acquire in the same window must wait (2 limiter passes happened)
    throttled(pd.Series(["b"]))
    assert len(waits) == 1 and abs(waits[0] - 1.0) < 1e-6


def test_compact_table_reduces_files_and_preserves_data(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(10_000).selectExpr("id", "id % 7 AS k").repartition(32).write.parquet(path)
    import glob as _glob

    before = len(_glob.glob(path + "/part-*"))
    assert before >= 32
    n = writers.compact_table(spark, path, target_file_bytes=10**9)  # fits in 1
    after = len(_glob.glob(path + "/part-*"))
    assert n == 1 and after == 1
    got = spark.read.parquet(path)
    assert got.count() == 10_000
    assert got.agg(F.sum("id")).collect()[0][0] == 10_000 * 9_999 // 2


def test_compact_table_sorted_clusters_key(spark, tmp_path):
    path = str(tmp_path / "frag2")
    spark.range(1000).selectExpr("id", "cast(id % 97 AS long) AS k").repartition(8).write.parquet(path)
    writers.compact_table(spark, path, target_file_bytes=10**9, sort_cols=["k"])
    pdf = spark.read.parquet(path).toPandas()
    # single sorted file: k must arrive non-decreasing
    assert list(pdf["k"]) == sorted(pdf["k"])


def test_overwrite_partitions_touches_only_present_days(spark, tmp_path):
    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c")], ["day", "id", "v"]
    )
    base.write.partitionBy("day").parquet(path)
    # backfill d1 only; d2 must survive untouched
    writers.overwrite_partitions(
        spark.createDataFrame([("d1", 9, "z")], ["day", "id", "v"]), path, ["day"]
    )
    got = {(r.day, r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {("d1", 9, "z"), ("d2", 3, "c")}


def test_plan_audit_catches_cartesian_and_counts(spark):
    from reddit_twitter_big_data_pipeline_spark.plans import audit

    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    cross = a.crossJoin(b)
    with pytest.raises(AssertionError, match="Cartesian|NestedLoop"):
        audit.assert_no_cartesian(cross)
    joined = a.join(F.broadcast(b), a["id"] == b["id2"])
    audit.assert_no_cartesian(joined)
    audit.assert_broadcasts(joined, 1)
    assert audit.summarize(joined)["BroadcastHashJoin"] >= 1


def test_zorder_compaction_clusters_both_dims(spark, tmp_path):
    path = str(tmp_path / "zt")
    df = spark.range(4096).selectExpr(
        "id", "cast(id % 64 AS long) AS x", "cast(cast(id / 64 AS long) AS long) AS y"
    )
    df.repartition(8).write.parquet(path)
    writers.compact_table(spark, path, target_file_bytes=8_000, zorder_cols=["x", "y"])

    # Z-ordered files must be selective on BOTH dims: for each output file,
    # the x and y ranges should each span a minority of the domain.
    import glob as _glob

    files = _glob.glob(path + "/part-*")
    assert len(files) >= 2
    spans_x, spans_y = [], []
    for f in files:
        pdf = spark.read.parquet(f).toPandas()
        spans_x.append(pdf["x"].max() - pdf["x"].min())
        spans_y.append(pdf["y"].max() - pdf["y"].min())
    # average span well under the full 0..63 domain on both dimensions
    assert sum(spans_x) / len(spans_x) < 48
    assert sum(spans_y) / len(spans_y) < 48
    assert spark.read.parquet(path).count() == 4096

    with pytest.raises(ValueError, match="not both"):
        writers.compact_table(spark, path, sort_cols=["x"], zorder_cols=["y"])


def test_zorder_value_rejects_overflowing_bits(spark):
    df = spark.range(4).selectExpr("id a", "id b", "id c", "id d")
    with pytest.raises(ValueError, match="63"):
        df.select(writers.zorder_value("a", "b", "c", "d", bits=20))
    # default bits adapt to the column count (4 cols -> 15 bits each)
    assert df.select(writers.zorder_value("a", "b", "c", "d")).count() == 4


def test_rate_limited_backend_state_survives_task_reserialization(tmp_path):
    """Spark re-deserializes UDF closures per task; two unpickled copies of
    the same wrapped backend must share ONE limiter window (worker-global
    registry), or back-to-back tasks could double the rate. The sleeper
    records to a FILE because each pickled copy gets its own copy of any
    captured list — only the registry itself is shared."""
    from pyspark import cloudpickle

    record = str(tmp_path / "waits.log")

    def sleeper(s):
        with open(record, "a") as f:
            f.write(f"{s}\n")

    throttled = enrich.rate_limited_backend(
        lambda texts: texts, rate=2, per_s=1.0, clock=lambda: 0.0, sleeper=sleeper
    )
    blob = cloudpickle.dumps(throttled)
    copy1 = cloudpickle.loads(blob)  # "task 1"
    copy2 = cloudpickle.loads(blob)  # "task 2", same worker process
    copy1(pd.Series(["a"]))
    copy2(pd.Series(["b"]))  # window now holds 2 calls ACROSS tasks
    assert not os.path.exists(record)  # first two calls fit the window
    copy2(pd.Series(["c"]))  # third call in the frozen-clock window waits
    waits = [float(x) for x in open(record).read().split()]
    assert waits == [1.0]
