"""Concrete external graph sink — batched, retrying, idempotent upserts of
the nodes/edges model through `foreach_partition_sink` (K8).

The reference serves its graph by running one Cypher transaction per record
from a driver loop (reference: glue/reddit_glue.py:70-126,
neo4j_insert/neo4j_twitter_insert.py:60-82). This module is the adapter a
migrating user plugs their store into: each Spark partition opens ONE
connection, groups rows into batched parameterized MERGE statements, and
retries transient failures with exponential backoff. Statements use MERGE
(create-or-match) semantics keyed on the natural key, so replaying a batch —
after a retry, a task re-launch, or a micro-batch replay — converges to the
same graph (the idempotency the reference gets from Cypher MERGE).

The transport is injected: any callable `send(statement, params_list)` works
(a bolt-driver session.run, an HTTP endpoint, a JDBC batch). Tests use a
recording mock; nothing here imports a driver library.

Scale notes: batches are built per PARTITION (no shuffle, no collect);
`batch_size` bounds transaction size; connection count = partition count, so
repartition(n) before the sink to match the store's write concurrency — the
same backpressure pattern the enrichment UDFs use.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, Row

from .._retry import call_with_retry
from .writers import foreach_partition_sink

# Parameterized, MERGE-semantics statement templates (Cypher-shaped, since
# the reference's store is a property graph; a JDBC adapter would swap the
# text, not the flow). One statement per batch with UNWIND — the standard
# way to amortize round-trips.
NODE_MERGE = (
    "UNWIND $rows AS row "
    "MERGE (n:%(label)s {id: row.node_id}) "
    "SET n += row.props"
)
EDGE_MERGE = (
    "UNWIND $rows AS row "
    "MATCH (a {id: row.src}) MATCH (b {id: row.dst}) "
    "MERGE (a)-[r:%(rel_type)s]->(b)"
)


class TransientSinkError(Exception):
    """Raise from a transport for retryable failures (throttle, timeout,
    leader election). Non-transient exceptions propagate immediately and
    fail the task — Spark's task retry then replays the partition, which is
    safe because every statement is a MERGE."""


def _chunks(rows: Iterable[Row], size: int) -> Iterator[list[dict]]:
    buf: list[dict] = []
    for r in rows:
        buf.append(r.asDict(recursive=True))
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


def _send_with_retry(
    send: Callable[[str, list[dict]], None],
    statement: str,
    rows: list[dict],
    max_retries: int,
    backoff_s: float,
    sleep: Callable[[float], None] | None = None,
) -> None:
    call_with_retry(
        lambda: send(statement, rows),
        transient=TransientSinkError,
        max_retries=max_retries,
        backoff_s=backoff_s,
        sleep=sleep,
    )


def write_nodes(
    nodes: DataFrame,
    transport_factory: Callable[[], Callable[[str, list[dict]], None]],
    batch_size: int = 500,
    max_retries: int = 3,
    backoff_s: float = 0.05,
    sleep=None,
) -> None:
    """Upsert a nodes(node_id, label, props) frame. Batches are grouped by
    label inside each partition so each statement has one node label (labels
    are not parameterizable in Cypher)."""

    def writer_factory():
        send = transport_factory()

        def write(rows: Iterable[Row]) -> None:
            by_label: dict[str, list[Row]] = {}
            for r in rows:
                by_label.setdefault(r["label"], []).append(r)
            for label, group in by_label.items():
                stmt = NODE_MERGE % {"label": label}
                for batch in _chunks(group, batch_size):
                    payload = [
                        {"node_id": b["node_id"], "props": b.get("props") or {}}
                        for b in batch
                    ]
                    _send_with_retry(send, stmt, payload, max_retries, backoff_s, sleep)

        return write

    foreach_partition_sink(nodes, writer_factory)


def write_edges(
    edges: DataFrame,
    transport_factory: Callable[[], Callable[[str, list[dict]], None]],
    batch_size: int = 500,
    max_retries: int = 3,
    backoff_s: float = 0.05,
    sleep=None,
) -> None:
    """Upsert an edges(src, dst, rel_type) frame, batched per rel_type."""

    def writer_factory():
        send = transport_factory()

        def write(rows: Iterable[Row]) -> None:
            by_rel: dict[str, list[Row]] = {}
            for r in rows:
                by_rel.setdefault(r["rel_type"], []).append(r)
            for rel, group in by_rel.items():
                stmt = EDGE_MERGE % {"rel_type": rel}
                for batch in _chunks(group, batch_size):
                    payload = [{"src": b["src"], "dst": b["dst"]} for b in batch]
                    _send_with_retry(send, stmt, payload, max_retries, backoff_s, sleep)

        return write

    foreach_partition_sink(edges, writer_factory)


def write_graph(
    nodes: DataFrame,
    edges: DataFrame,
    transport_factory: Callable[[], Callable[[str, list[dict]], None]],
    **kw,
) -> None:
    """Nodes first, then edges — edges MATCH their endpoints, mirroring the
    reference's insert order (neo4j_insert/neo4j_reddit_insert.py:60-76)."""
    write_nodes(nodes, transport_factory, **kw)
    write_edges(edges, transport_factory, **kw)


from .._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
