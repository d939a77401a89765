"""Concrete HTTP enrichment backends for the U1-U3 seams.

The reference's production operating mode is live HTTP enrichment —
per-row translation (reference: translate/translate.py:55-61), sentiment in
batches of 25 (reference: glue/reddit_glue.py:155-180), and a GET-per-claim
scorer defaulting to 0.0 on any error (reference: claim_buster.py:7-20).
These are the engine-side equivalents: batch-oriented callables that plug
into ``enrich.set_backend`` and compose with ``retrying_backend`` (backoff +
per-item salvage + null-on-error) and ``rate_limited_backend`` (sliding-
window quota) — the full production stack is
``retrying_backend(rate_limited_backend(http_*_backend(...), rate=...))``.

The HTTP transport is INJECTED (any ``transport(url, payload|None) -> dict``
callable; default urllib opener) so the whole path — request shaping,
response parsing, transient-error classification, retry, salvage, throttle —
runs under pytest with a fake transport. This container has no egress;
nothing here imports beyond the stdlib.

Error contract: HTTP 429 and 5xx (and socket timeouts) raise
``TransientEnrichError`` so the retry layer backs off and salvages;
malformed responses raise ``MalformedResponseError`` → the retry layer's
null-on-error path (the reference instead silently wrote '' / 0.0 — we
keep nulls so the scrub stage F3 can drop them explicitly). A bare
ValueError from backend code propagates and fails the task loudly.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable

import pandas as pd

from .enrich import SENTIMENT_BATCH, MalformedResponseError, TransientEnrichError

Transport = Callable[[str, dict | None], dict]


def urllib_transport(timeout_s: float = 10.0, headers: dict | None = None) -> Transport:
    """Default transport: GET when payload is None, JSON POST otherwise.
    Classifies 429/5xx/timeouts as transient."""

    def call(url: str, payload: dict | None) -> dict:
        data = None if payload is None else json.dumps(payload).encode()
        req = urllib.request.Request(url, data=data, headers=headers or {})
        if data is not None:
            req.add_header("Content-Type", "application/json")
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            if e.code == 429 or e.code >= 500:
                raise TransientEnrichError(f"HTTP {e.code}") from e
            raise
        except (urllib.error.URLError, TimeoutError) as e:
            raise TransientEnrichError(str(e)) from e

    return call


def http_translate_backend(
    base_url: str,
    target_lang: str = "en",
    transport: Transport | None = None,
) -> Callable[[pd.Series], pd.Series]:
    """U1: one JSON POST per Arrow batch — {texts, target} → {translations}.
    (The reference calls GoogleTranslator row by row; batching the POST is
    the engine-side improvement, same per-text semantics.)"""
    tr = transport or urllib_transport()

    def translate(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return texts
        resp = tr(
            f"{base_url.rstrip('/')}/translate",
            {"texts": [t if t is not None else "" for t in texts], "target": target_lang},
        )
        out = resp["translations"]
        if len(out) != len(texts):
            raise MalformedResponseError(
                f"translate: {len(out)} translations for {len(texts)} texts"
            )
        return pd.Series(out, index=texts.index)

    return translate


def http_sentiment_backend(
    base_url: str,
    transport: Transport | None = None,
) -> Callable[[pd.Series], pd.DataFrame]:
    """U2: one JSON POST per ≤25-text chunk (the API batch limit the
    reference hand-rolls, glue/reddit_glue.py:162) → 4 score columns.
    Alignment is positional WITHIN one response but rides the pandas index
    end-to-end, so rows re-join by id — never by the reference's fragile
    computed-index math (its i*len(batch) bug is documented in SURVEY §2.4)."""
    tr = transport or urllib_transport()

    def sentiment(texts: pd.Series) -> pd.DataFrame:
        if len(texts) == 0:
            return pd.DataFrame(
                {"Positive": [], "Negative": [], "Neutral": [], "Mixed": []}
            )
        # one POST per ≤25-text chunk: an Arrow batch is thousands of rows,
        # and a real API enforcing the limit would reject the whole batch
        # (sentiment_udf also chunks, but the backend must honor its own
        # contract when driven directly or through retrying_backend's
        # full-batch path)
        parts = []
        for i in range(0, len(texts), SENTIMENT_BATCH):
            chunk = texts.iloc[i : i + SENTIMENT_BATCH]
            resp = tr(
                f"{base_url.rstrip('/')}/sentiment",
                {"texts": [t if t is not None else "" for t in chunk]},
            )
            scores = resp["scores"]
            if len(scores) != len(chunk):
                raise MalformedResponseError(
                    f"sentiment: {len(scores)} scores for {len(chunk)} texts"
                )
            parts.append(
                pd.DataFrame(
                    {
                        k: [s[k] for s in scores]
                        for k in ("Positive", "Negative", "Neutral", "Mixed")
                    },
                    index=chunk.index,
                )
            )
        return pd.concat(parts)

    return sentiment


def http_claim_backend(
    base_url: str,
    api_key: str = "",
    transport: Transport | None = None,
) -> Callable[[pd.Series], pd.Series]:
    """U3: GET score/text/<quoted text> per row (the ClaimBuster shape,
    claim_buster.py:7-20) → results[0].score. A malformed single response
    scores None for THAT row only (the retry layer's per-item salvage
    handles batch-level transients)."""
    tr = transport or urllib_transport(headers={"x-api-key": api_key} if api_key else None)

    def claim(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            resp = tr(
                f"{base_url.rstrip('/')}/score/text/"
                + urllib.parse.quote(t if t is not None else ""),
                None,
            )
            try:
                out.append(float(resp["results"][0]["score"]))
            except (KeyError, IndexError, TypeError, ValueError):
                out.append(None)
        return pd.Series(out, index=texts.index, dtype="float64")

    return claim


def install_http_backends(
    base_url: str,
    api_key: str = "",
    rate: int = 10,
    per_s: float = 1.0,
    max_retries: int = 3,
    transport: Transport | None = None,
) -> None:
    """Wire the full production stack into the enrichment seams:
    HTTP backend → sliding-window rate limit → retry/backoff with
    per-item salvage and null-on-error. After this, ``enrich.enrich(df)``
    runs the live path; tests pass a fake ``transport``."""
    from .enrich import rate_limited_backend, retrying_backend, set_backend

    set_backend(
        "translate",
        retrying_backend(
            rate_limited_backend(
                http_translate_backend(base_url, transport=transport),
                rate=rate,
                per_s=per_s,
            ),
            max_retries=max_retries,
        ),
    )
    set_backend(
        "sentiment",
        retrying_backend(
            rate_limited_backend(
                http_sentiment_backend(base_url, transport=transport),
                rate=rate,
                per_s=per_s,
            ),
            max_retries=max_retries,
            null_columns=["Positive", "Negative", "Neutral", "Mixed"],
        ),
    )
    set_backend(
        "claim",
        retrying_backend(
            rate_limited_backend(
                http_claim_backend(base_url, api_key, transport=transport),
                rate=rate,
                per_s=per_s,
            ),
            max_retries=max_retries,
        ),
    )


from .._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
