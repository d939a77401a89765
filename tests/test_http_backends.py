"""HTTP enrichment backends (functions.http_backends) driven end-to-end
through a fake transport: request shaping, response parsing, transient
retry, per-item salvage, and the full install_http_backends stack under
enrich.enrich()."""

from __future__ import annotations

import pandas as pd
import pytest

from reddit_twitter_big_data_pipeline_spark.functions import enrich, http_backends as hb


class FakeTransport:
    """Records calls; scripts failures. fail_first=N raises a transient
    error on the first N calls (an HTTP 429 in the real transport)."""

    def __init__(self, fail_first: int = 0):
        self.calls: list[tuple[str, dict | None]] = []
        self.fail_first = fail_first

    def __call__(self, url: str, payload: dict | None) -> dict:
        self.calls.append((url, payload))
        if self.fail_first > 0:
            self.fail_first -= 1
            raise enrich.TransientEnrichError("HTTP 429")
        if url.endswith("/translate"):
            return {"translations": [t.upper() for t in payload["texts"]]}
        if url.endswith("/sentiment"):
            return {
                "scores": [
                    {"Positive": 0.7, "Negative": 0.1, "Neutral": 0.1, "Mixed": 0.1}
                    for _ in payload["texts"]
                ]
            }
        # claim GET: score derived from the quoted text length for determinism
        return {"results": [{"score": round(len(url) % 10 / 10.0, 1)}]}


def test_translate_batch_post_and_parse():
    t = FakeTransport()
    out = hb.http_translate_backend("http://api", transport=t)(pd.Series(["a", "b"]))
    assert out.tolist() == ["A", "B"]
    url, payload = t.calls[0]
    assert url == "http://api/translate" and payload == {"texts": ["a", "b"], "target": "en"}


def test_translate_length_mismatch_is_value_error():
    def bad(url, payload):
        return {"translations": ["only-one"]}

    with pytest.raises(ValueError):
        hb.http_translate_backend("http://api", transport=bad)(pd.Series(["a", "b"]))


def test_sentiment_shapes_and_index():
    t = FakeTransport()
    s = pd.Series(["x", "y"], index=[7, 9])
    df = hb.http_sentiment_backend("http://api", transport=t)(s)
    assert list(df.columns) == ["Positive", "Negative", "Neutral", "Mixed"]
    assert list(df.index) == [7, 9]  # id-aligned, not positional


def test_claim_per_row_get_with_quoting_and_salvage():
    t = FakeTransport()
    out = hb.http_claim_backend("http://api", transport=t)(pd.Series(["a b", None]))
    # one GET per row, spaces quoted, None becomes empty text
    assert len(t.calls) == 2
    assert t.calls[0][0] == "http://api/score/text/a%20b"
    assert t.calls[1][0] == "http://api/score/text/"
    assert out.notna().all()

    def malformed(url, payload):
        return {"results": []}

    out2 = hb.http_claim_backend("http://api", transport=malformed)(pd.Series(["z"]))
    assert out2.isna().all()  # malformed single response → null, not crash


def test_retry_recovers_from_transient_429():
    t = FakeTransport(fail_first=1)
    stack = enrich.retrying_backend(
        hb.http_translate_backend("http://api", transport=t), backoff_s=0.0
    )
    out = stack(pd.Series(["ok"]))
    assert out.tolist() == ["OK"]
    assert len(t.calls) == 2  # failed once, retried once


def test_install_http_backends_full_stack():
    # The composed production stack (http → rate limit → retry) exercised
    # at the pandas level: a transport-state test can't cross Spark's
    # worker-process boundary, and the UDF-through-Spark seam is already
    # covered by test_enrich.test_backend_seam_swappable.
    saved = dict(enrich.BACKENDS)
    try:
        t = FakeTransport(fail_first=1)  # first call 429s; retry must absorb it
        hb.install_http_backends("http://api", rate=1000, transport=t)
        out = enrich.BACKENDS["translate"](pd.Series(["war in city"]))
        assert out.tolist() == ["WAR IN CITY"]
        assert len(t.calls) == 2  # the 429 was retried through the stack
        sdf = enrich.BACKENDS["sentiment"](pd.Series(["peace talks"]))
        assert abs(sdf["Positive"].iloc[0] - 0.7) < 1e-9
        cs = enrich.BACKENDS["claim"](pd.Series(["officials report data"]))
        assert cs.notna().all()
        paths = {u.split("http://api/")[1].split("/")[0] for u, _ in t.calls}
        assert {"translate", "sentiment", "score"} <= paths
    finally:
        enrich.BACKENDS.update(saved)
