"""Shared transient-failure retry helper.

One exponential-backoff loop serves both external-facing layers — the
enrichment backends (functions/enrich.py) and the graph sink
(sinks/graph_sink.py) — parameterized on the transient exception type and an
injectable sleeper so tests never wall-clock wait. Runs on executors inside
UDF / foreachPartition closures, hence the by-value registration below.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

R = TypeVar("R")


def call_with_retry(
    fn: Callable[[], R],
    transient: type[BaseException] | tuple[type[BaseException], ...],
    max_retries: int = 3,
    backoff_s: float = 0.05,
    sleep: Callable[[float], None] | None = None,
) -> R:
    """Invoke `fn`, retrying on `transient` with exponential backoff
    (backoff_s, 2*backoff_s, 4*backoff_s, ...), up to `max_retries` retries.
    Any other exception propagates immediately."""
    _sleep = sleep if sleep is not None else time.sleep
    attempt = 0
    while True:
        try:
            return fn()
        except transient:
            attempt += 1
            if attempt > max_retries:
                raise
            _sleep(backoff_s * (2 ** (attempt - 1)))


from ._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
