"""API-scrape ingest connectors — SURVEY §2.1 S6/S7/S8 as distributed,
rate-limited fetch stages.

The reference scrapes with one Lambda per topic on a 15-minute cron
(reference: twitter/lambda_function.py:27-29 — snscrape query per topic;
reddit/lambda_function.py:43-70 — praw hot posts + comment trees) and
re-fetches individual posts days later to pick up settled scores
(reference: reddit/lambda_function_aggregate.py:59-71). Here the same three
capabilities are Spark stages with an injected transport:

- **fetch_topics**: the topic list becomes a DataFrame, repartitioned to
  `api_slots` partitions; each partition runs ONE rate-limited client via
  mapInPandas and yields raw records. Concurrency = partition count — the
  same backpressure-as-partitioning pattern the enrichment UDFs use.
- **refetch_by_ids** (S8, the fetch side): a frame of ids → batched per-id
  re-fetch → an updates frame shaped for sinks.writers.merge_upsert (the
  merge side that already existed).
- **RateLimiter**: token-bucket, injectable clock so tests are instant.

The transport is a plain callable (`fetch(topic, since, until) -> list of
dict` / `fetch_ids(ids) -> list of dict`) built by a factory ON THE
EXECUTOR (clients are rarely picklable). No scraping library is imported
here — a real deployment wraps snscrape/praw/HTTP in the factory; tests
inject deterministic fakes. Records are returned as JSON strings + topic so
one schema fits every source; parse with from_json(schema) downstream —
the same landing contract as the reference's raw JSON files.
"""

from __future__ import annotations

import json
import uuid
import time
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .._serde import register_self

RAW_SCHEMA = "topic string, payload string"


def _process_limiter(key: str, rate: int, per_s: float) -> "RateLimiter":
    """Process-global limiter registry (same mechanism as
    enrich.rate_limited_backend): mapInPandas closures are re-deserialized
    per TASK, and a fresh (empty) sliding window per task would let
    back-to-back short tasks double the rate inside one wall-clock window.
    The key is minted once on the driver at plan-build time; every task
    that runs on the same worker process shares the keyed limiter."""
    import builtins

    reg = getattr(builtins, "__engine_rate_limiters__", None)
    if reg is None:
        reg = {}
        builtins.__engine_rate_limiters__ = reg
    if key not in reg:
        reg[key] = RateLimiter(rate, per_s)
    return reg[key]


class RateLimiter:
    """Sliding-window limiter: at most `rate` calls inside ANY window of
    `per_s` seconds, per client — the guarantee API quotas actually mean
    (a token bucket's burst+refill can legally double that in one window;
    the hypothesis property test caught exactly that). Keeps the last
    `rate` call timestamps in a ring; a call sleeps until the oldest falls
    out of the window. The reference enforced this with cron spacing; here
    each executor slot polices itself. `clock`/`sleeper` are injectable for
    tests."""

    def __init__(
        self,
        rate: int,
        per_s: float = 1.0,
        clock: Callable[[], float] | None = None,
        sleeper: Callable[[float], None] | None = None,
    ):
        from collections import deque

        self.rate = rate
        self.per_s = per_s
        self._clock = clock or time.monotonic
        self._sleep = sleeper or time.sleep
        self._stamps: deque = deque(maxlen=rate)

    def acquire(self) -> None:
        now = self._clock()
        if len(self._stamps) == self.rate:
            oldest = self._stamps[0]
            wait = oldest + self.per_s - now
            if wait > 0:
                self._sleep(wait)
                now = self._clock()
        self._stamps.append(now)


def fetch_topics(
    spark: SparkSession,
    topics: list[str],
    transport_factory: Callable[[], Callable[[str, str, str], list]],
    since: str,
    until: str,
    api_slots: int = 4,
    rate: int = 5,
    per_s: float = 1.0,
) -> DataFrame:
    """S6/S7: distributed topic scrape → raw (topic, payload-JSON) frame.

    One transport client + one rate limiter per partition; `api_slots`
    bounds concurrent clients exactly like the reference's per-Lambda
    concurrency limit. The result is unparsed JSON — land it with
    sinks.writers.write_partitioned_json and let the W1 file stream pick it
    up, or parse inline with from_json.
    """
    tdf = spark.createDataFrame([(t,) for t in topics], ["topic"]).repartition(api_slots)
    limiter_key = f"ingest-{uuid.uuid4().hex}"  # minted once on the driver

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = transport_factory()
        limiter = _process_limiter(limiter_key, rate, per_s)
        for pdf in batches:
            for topic in pdf["topic"]:
                limiter.acquire()
                records = fetch(topic, since, until)
                if records:
                    yield pd.DataFrame(
                        {
                            "topic": [topic] * len(records),
                            "payload": [json.dumps(r, sort_keys=True) for r in records],
                        }
                    )

    return tdf.mapInPandas(run, RAW_SCHEMA)


def refetch_by_ids(
    ids: DataFrame,
    transport_factory: Callable[[], Callable[[list], list]],
    id_col: str = "id",
    batch_size: int = 25,
    rate: int = 5,
    per_s: float = 1.0,
) -> DataFrame:
    """S8 (fetch side): point re-fetch of known ids — the reference's
    T+2/T+3-day score refresh. Ids are batched (`batch_size` mirrors the
    API's multi-get limit), each batch rate-limited; output is a raw
    (topic='refetch', payload) frame to merge with
    sinks.writers.merge_upsert after parsing."""

    limiter_key = f"refetch-{uuid.uuid4().hex}"  # minted once on the driver

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch_ids = transport_factory()
        limiter = _process_limiter(limiter_key, rate, per_s)
        for pdf in batches:
            vals = list(pdf[id_col])
            for i in range(0, len(vals), batch_size):
                chunk = vals[i : i + batch_size]
                limiter.acquire()
                records = fetch_ids(chunk)
                if records:
                    yield pd.DataFrame(
                        {
                            "topic": ["refetch"] * len(records),
                            "payload": [json.dumps(r, sort_keys=True) for r in records],
                        }
                    )

    return ids.mapInPandas(run, RAW_SCHEMA)


def parse_payload(raw: DataFrame, schema) -> DataFrame:
    """Landing → typed: one from_json projection (schema explicit, never
    inferred — PERMISSIVE mode surfaces corrupt rows as nulls)."""
    return raw.select(
        "topic", F.from_json("payload", schema).alias("rec")
    ).select("topic", "rec.*")


register_self(__name__)
