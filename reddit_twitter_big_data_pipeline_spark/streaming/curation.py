"""Streaming corpus curation — the batch `curate_*` gate stack applied to
a document STREAM ("curate the crawl as it lands"), the steady-state
shape between full-corpus curation (`plans/training.py:curate_corpus_v2`)
and daily batch admission (`curate_increment`). The reference has no
streaming at all (SURVEY §2.6 extension).

Stage map — every stage reuses the batch stack's single definition:

1. row-local gates: `plans.training._corpus_gated` (confidence langid,
   broadcast blocklist anti-join, integer micro-unit quality) — pure
   column expressions and a stream-static join, streaming-safe as-is;
   the event-time column threads through via its `keep_extra`;
2. exact dedup: watermark + `dropDuplicatesWithinWatermark` on the
   content fingerprint (`operators/text.py:fingerprint`) — state is one
   16-byte fp per surviving doc inside the horizon, expiring with the
   watermark;
3. per-domain quota: `domain_quota_admit`, a custom stateful operator
   (`applyInPandasWithState`) whose state is ONE LONG per domain (total
   admitted so far) — the streaming twin of `curate_increment`'s
   remaining-quota ranking. Within a micro-batch rows admit in id order
   (the deterministic tiebreak); across batches, arrival order decides,
   which IS the streaming admission semantic.

State discipline (the 100-TB rules, matching stateful.py): quota state
is a single counter per domain — never buffered rows; dedup state is
watermark-bounded; handlers iterate Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .._serde import register_self
from ..operators import text as text_ops
from ..plans.training import _corpus_gated

_QUOTA_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


def domain_quota_admit(
    docs: DataFrame,
    cap: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit at most `cap` documents per domain over the STREAM's lifetime,
    emitting admitted rows with their full input schema. State = one long
    per domain (admitted count). Within a micro-batch, the `cap − n`
    smallest `id_col` rows of the WHOLE group win (the exact-dedupe min-id
    convention) — the group arrives as multiple Arrow chunks, so the
    handler keeps a rolling buffer of the current best ≤ `cap − n` rows
    across chunks (bounded by the cap, never by group size) and emits
    once. Per-chunk admission would depend on chunk boundaries, which are
    not deterministic across retries/replays."""

    out_schema = docs.schema

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        take = cap - n
        if take > 0:
            best: pd.DataFrame | None = None
            for pdf in pdfs:
                cand = pdf if best is None else pd.concat([best, pdf])
                best = cand.sort_values(id_col).head(take)
            if best is not None and len(best):
                n += len(best)
                yield best
        else:
            for _ in pdfs:  # drain the iterator; the group is at cap
                pass
        state.update((int(n),))

    return docs.groupBy(domain_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_QUOTA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def curate_stream(
    stream: DataFrame,
    blocked: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str = "url",
    blocked_col: str = "domain",
    ts_col: str = "ts",
    min_margin: int = 2,
    q_micro_min: int = 150_000,
    domain_cap: int = 20,
    dedup_delay: str = "1 hour",
) -> DataFrame:
    """The composed streaming curation pipeline: gates → fp-dedup within
    the watermark → per-domain quota. Returns admitted rows
    (id, text, url, ts, lang, domain). See the module docstring for the
    stage map; thresholds share the batch stack's defaults."""
    gated = _corpus_gated(
        stream, blocked, id_col, text_col, url_col, blocked_col,
        min_margin, q_micro_min, keep_extra=(ts_col,),
    )
    deduped = (
        gated.withColumn("__fp", text_ops.fingerprint(text_col))
        .withWatermark(ts_col, dedup_delay)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
    return domain_quota_admit(deduped, domain_cap, domain_col="domain", id_col=id_col)


register_self(__name__)
