"""Concrete third-party connector wrappers (VERDICT r12 item 6) — the
~50-line deployment bindings that plug real praw / snscrape / neo4j
clients into the engine's injectable seams:

  praw_fetch_factory      -> sources.ingest.fetch_topics transport
                             (reference: reddit/lambda_function.py:43-70)
  snscrape_fetch_factory  -> sources.ingest.fetch_topics transport
                             (reference: twitter/lambda_function.py:27-43)
  neo4j_transport_factory -> sinks.graph_sink transport
                             (reference: neo4j_insert/neo4j_reddit_insert.py:1-10,
                              glue/reddit_glue.py:31,70-126)
  google_translate_backend    -> functions.enrich set_backend('translate')
                             (reference: glue/reddit_glue.py:31-32,232-236)
  comprehend_sentiment_backend -> functions.enrich set_backend('sentiment')
                             (reference: glue/reddit_glue.py:155-181 — with
                              its two batch-alignment bugs FIXED, not replayed)

Record SHAPES are field-for-field the reference's landing format — same
keys, same casts (the P1 str/int coercions) — so a corpus scraped through
these wrappers is byte-compatible with one scraped by the reference's
Lambdas, and the S7 parse schemas (`schemas.REDDIT_POST`, ...) read both.
The shaping lives in pure functions (`praw_post_record`, ...) so the
sandbox tests pin parity against the reference's committed dumps
(reference: reddit/development/reddit_posts_dump3.json) with a faked
client and no network.

Import discipline: none of the third-party libraries is imported at
module import time — each factory imports its client lazily, inside the
closure that runs once per Spark partition (executor-side), and raises a
clear ImportError naming the missing dependency. This module therefore
always imports cleanly in environments without the clients installed
(this sandbox included); only USING a factory requires its library.

The distributed mechanics (rate limiting, partition-level client reuse,
batching, retries) all stay in the seams these wrappers plug into —
`sources/ingest.py` and `sinks/graph_sink.py` — so a custom client only
ever writes the ~20 lines below, never the orchestration.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Callable


def _need(module: str, pipname: str):
    try:
        return __import__(module)
    except ImportError as ex:  # pragma: no cover - exercised via message test
        raise ImportError(
            f"connectors: {module!r} is not installed — this wrapper is a "
            f"deployment binding; `pip install {pipname}` where the "
            "executors run (it is deliberately not a sandbox dependency)"
        ) from ex


def _as_dt(v: str | datetime) -> datetime:
    return v if isinstance(v, datetime) else datetime.fromisoformat(str(v))


# --------------------------------------------------------------- praw (S6/S7)


def praw_post_record(post: Any) -> dict:
    """One Reddit post, field-for-field the reference's landing shape
    with its P1 casts (reference: reddit/lambda_function.py:46-55)."""
    return {
        "id": str(post.id),
        "date": str(datetime.fromtimestamp(post.created_utc)),
        "title": str(post.title),
        "content": str(post.selftext),
        "username": str(post.author),
        "commentCount": int(post.num_comments),
        "score": int(post.score),
        "subreddit": str(post.subreddit),
    }


def praw_comment_record(comment: Any, post_id: str) -> dict:
    """One Reddit comment, field-for-field the reference's landing shape
    (reference: reddit/lambda_function.py:62-70). Note the reference's
    own asymmetry, preserved: the username comes from `author.name`
    while posts use `str(author)`."""
    return {
        "id": str(comment.id),
        "date": str(datetime.fromtimestamp(comment.created_utc)),
        "content": str(comment.body),
        "username": str(comment.author.name),
        "score": int(comment.score),
        "post_id": str(post_id),
        "parent_id": str(comment.parent_id),
    }


def praw_reddit_factory(
    client_id: str, client_secret: str, user_agent: str
) -> Callable[[], Any]:
    """A `reddit_factory` for `praw_fetch_factory`: builds the praw client
    executor-side (credentials travel as strings; the client object —
    which holds sockets — is never pickled)."""

    def make():
        praw = _need("praw", "praw")
        return praw.Reddit(
            client_id=client_id, client_secret=client_secret, user_agent=user_agent
        )

    return make


def praw_fetch_factory(
    reddit_factory: Callable[[], Any],
    what: str = "posts",
    subreddit: str = "all",
    sort: str = "new",
    time_filter: str = "week",
    skip_authors: tuple[str, ...] = ("AutoModerator",),
) -> Callable[[], Callable[[str, str, str], list]]:
    """Transport factory for `sources.ingest.fetch_topics` replaying the
    reference's Reddit scrape loop (reference: reddit/lambda_function.py:
    43-70): search r/all for the topic (sort=new, time_filter=week),
    keep posts whose created time falls inside [since, until] (the
    reference skips `< start or > end` — inclusive bounds), and — for
    `what` in ("comments", "both") — walk each kept post's full comment
    tree (`replace_more(limit=None)`), skipping `skip_authors`
    (AutoModerator, the reference's bot filter at :61).

    `what`: "posts" (default) emits post records, "comments" emits
    comment records, "both" emits posts followed by their comments —
    the records are schema-distinguishable (posts carry title/subreddit,
    comments carry post_id/parent_id), mirroring the reference's two
    output files. One praw client per Spark partition (built by
    `reddit_factory`, e.g. `praw_reddit_factory(...)`); `fetch_topics`
    owns the rate limiting."""
    if what not in ("posts", "comments", "both"):
        raise ValueError("praw_fetch_factory: what must be posts|comments|both")

    def factory() -> Callable[[str, str, str], list]:
        reddit = reddit_factory()

        def fetch(topic: str, since: str, until: str) -> list:
            lo, hi = _as_dt(since), _as_dt(until)
            out: list[dict] = []
            for post in reddit.subreddit(subreddit).search(
                query=topic, sort=sort, time_filter=time_filter
            ):
                created = datetime.fromtimestamp(post.created_utc)
                if created < lo or created > hi:
                    continue
                if what in ("posts", "both"):
                    out.append(praw_post_record(post))
                if what in ("comments", "both") and int(post.num_comments) > 0:
                    submission = reddit.submission(id=post.id)
                    submission.comments.replace_more(limit=None)
                    for comment in submission.comments.list():
                        # deleted/removed comments carry author=None;
                        # praw_comment_record's author.name would raise
                        # and — unlike the reference Lambda, where one
                        # crash loses one invocation — deterministically
                        # fail the whole Spark task on every retry. Skip
                        # them like the bot filter does.
                        if comment.author is None:
                            continue
                        if str(comment.author) in skip_authors:
                            continue
                        out.append(praw_comment_record(comment, post.id))
            return out

        return fetch

    return factory


# ----------------------------------------------------------- snscrape (S6)


def snscrape_tweet_record(tweet: Any, time_stamp: str) -> dict:
    """One tweet, field-for-field the reference's landing shape
    (reference: twitter/lambda_function.py:30-43)."""
    return {
        "id": tweet.id,
        "date": tweet.date.strftime("%Y-%m-%d %H:%M:%S"),
        "content": tweet.rawContent,
        "username": tweet.user.username,
        "followersCount": tweet.user.followersCount,
        "mentionedUsers": (
            ",".join(u.username for u in tweet.mentionedUsers)
            if tweet.mentionedUsers
            else None
        ),
        "retweetCount": tweet.retweetCount,
        "replyCount": tweet.replyCount,
        "inReplyToUser": tweet.inReplyToUser.username if tweet.inReplyToUser else None,
        "timeStamp": str(time_stamp),
    }


def snscrape_fetch_factory(
    time_stamp: str,
    scraper_factory: Callable[[str], Any] | None = None,
) -> Callable[[], Callable[[str, str, str], list]]:
    """Transport factory for `fetch_topics` replaying the reference's
    Twitter scrape (reference: twitter/lambda_function.py:27-43):
    `TwitterSearchScraper(f"{query} since:{since} until:{until}")`, one
    record per tweet in the reference's landing shape. `since`/`until`
    are dates (YYYY-MM-DD, the scraper's own window syntax) — the
    reference's extra same-15-minute early-break at :28 is cron-cadence
    coupling, not query semantics, and is deliberately not replicated
    (the window bounds the scan instead). `scraper_factory` overrides
    the client construction for tests."""

    def factory() -> Callable[[str, str, str], list]:
        if scraper_factory is not None:
            make_scraper = scraper_factory
        else:
            sn = _need("snscrape.modules.twitter", "snscrape")
            twitter_mod = sn.modules.twitter

            def make_scraper(q: str):
                return twitter_mod.TwitterSearchScraper(q)

        def fetch(topic: str, since: str, until: str) -> list:
            q = f"{topic} since:{since} until:{until}"
            return [
                snscrape_tweet_record(t, time_stamp)
                for t in make_scraper(q).get_items()
            ]

        return fetch

    return factory


# ------------------------------------------------------------- neo4j (K8)

# per-process bolt-driver pool: (GraphDatabase identity, uri, user,
# password) -> driver. See neo4j_transport_factory's docstring.
_NEO4J_DRIVERS: dict = {}


def neo4j_transport_factory(
    uri: str,
    user: str,
    password: str,
    database: str = "neo4j",
) -> Callable[[], Callable[[str, list[dict]], None]]:
    """Transport factory for `sinks.graph_sink.write_graph`: one bolt
    driver per Spark partition, each batched UNWIND-MERGE statement run
    in a managed write transaction (`execute_write` — the driver retries
    inside it exactly as the reference's orchestrator relies on,
    reference: neo4j_insert/neo4j_reddit_insert.py:45-48). The driver's
    transient classes (ServiceUnavailable, SessionExpired, TransientError
    — leader elections, throttles) map to `TransientSinkError` so the
    sink's own backoff-retry layer handles what the managed transaction
    did not, and anything else fails the task (Spark's task retry then
    replays the partition; safe, every statement is a MERGE).

    Credentials travel as strings; sockets are opened executor-side and
    never pickled. The statement vocabulary is the sink's
    (`NODE_MERGE`/`EDGE_MERGE` with a `$rows` UNWIND parameter).

    The bolt driver (one connection pool + IO threads) is memoized
    PER-PROCESS, not per-partition: `write_graph` calls the factory once
    per partition, Spark reuses Python workers across tasks, and a fresh
    un-closed pool per partition would accumulate hundreds of open pools
    against the server's connection limit over a long job. The memo key
    includes the imported `GraphDatabase` class identity so a re-imported
    (or test-faked) neo4j module gets a fresh driver; the pool lives for
    the worker process's lifetime, which is exactly the bolt driver's
    intended usage ("one driver per application")."""

    def factory() -> Callable[[str, list[dict]], None]:
        neo4j = _need("neo4j", "neo4j")
        exc = __import__("neo4j.exceptions", fromlist=["exceptions"])
        transient = tuple(
            t
            for t in (
                getattr(exc, "ServiceUnavailable", None),
                getattr(exc, "SessionExpired", None),
                getattr(exc, "TransientError", None),
            )
            if t is not None
        )
        key = (id(neo4j.GraphDatabase), uri, user, password)
        driver = _NEO4J_DRIVERS.get(key)
        if driver is None:
            driver = _NEO4J_DRIVERS.setdefault(
                key, neo4j.GraphDatabase.driver(uri, auth=(user, password))
            )

        def send(statement: str, rows: list[dict]) -> None:
            from .sinks.graph_sink import TransientSinkError

            try:
                with driver.session(database=database) as session:
                    session.execute_write(
                        lambda tx: tx.run(statement, rows=rows).consume()
                    )
            except transient as ex:
                raise TransientSinkError(str(ex)) from ex

        return send

    return factory


# ------------------------------------------- deep_translator (U1) / boto3 (U2)


def google_translate_backend(
    source: str = "auto",
    target: str = "en",
    translator_factory: Callable[[], Any] | None = None,
) -> Callable:
    """U1 concrete binding: a `functions.enrich.set_backend('translate', ...)`
    pandas-batch backend wrapping deep_translator's GoogleTranslator — the
    reference's translator (reference: glue/reddit_glue.py:31-32, applied
    row-by-row at :232-236). Row-wise like the reference (the service has
    no batch endpoint worth the coupling); empty/None rows pass through
    untouched — the reference drops them BEFORE translating (:228-230),
    and deep_translator raises NotValidPayload on them.

    Transient service failures (deep_translator's TooManyRequests /
    RequestError — throttles, network) map to `TransientEnrichError`, so
    composing with `enrich.retrying_backend` gets batch retry + per-item
    salvage + null-on-exhaustion, strictly better than the reference's
    failed-row "" sentinel it later has to scrub (:239-241). Any other
    exception propagates and fails the task loudly.

    One translator per backend instance (built lazily on first call,
    executor-side — the factory closure travels, never the client)."""

    def backend(texts):
        import pandas as pd

        from .functions.enrich import TransientEnrichError

        if translator_factory is None:
            dt = _need("deep_translator", "deep-translator")
            tr = dt.GoogleTranslator(source=source, target=target)
        else:  # injected client: the lib is only needed for exception types
            try:
                dt = __import__("deep_translator")
            except ImportError:
                dt = None
            tr = translator_factory()
        exc = getattr(dt, "exceptions", None)
        transient = tuple(
            t
            for t in (
                getattr(exc, "TooManyRequests", None),
                getattr(exc, "RequestError", None),
            )
            if t is not None
        )

        def one(t):
            if t is None or t == "":
                return t
            try:
                return tr.translate(t)
            except transient as ex:
                raise TransientEnrichError(str(ex)) from ex

        return pd.Series([one(t) for t in texts], index=texts.index)

    return backend


# Comprehend's documented per-request cap (TextList ≤ 25 docs) and the
# reference's per-doc truncation guard (glue/reddit_glue.py:162, the
# commented-out 4500-char slice — Comprehend rejects docs > 5000 BYTES,
# so the slice is applied here for real, not left commented).
_COMPREHEND_BATCH = 25
_COMPREHEND_MAX_CHARS = 4500


def comprehend_sentiment_backend(
    region_name: str = "us-east-1",
    client_factory: Callable[[], Any] | None = None,
    language_code: str = "en",
) -> Callable:
    """U2 concrete binding: a `set_backend('sentiment', ...)` pandas-batch
    backend wrapping boto3 Comprehend `batch_detect_sentiment` (reference:
    glue/reddit_glue.py:155-181). Returns the Positive/Negative/Neutral/
    Mixed frame index-aligned to the input — with the reference's TWO
    alignment bugs fixed rather than replayed:

    - the reference offsets each result by `i*len(batch)` (:170), which
      misplaces every result of the LAST batch when it is partial (a
      52-doc list puts batch 2's results at 2*2=4.. instead of 50..);
      here the offset is the batch's true start position;
    - the reference iterates ResultList only, so any doc Comprehend
      rejects (ErrorList) silently SHIFTS nothing — it just vanishes,
      and the later positional zip misattributes sentiments to rows
      (the U2 operator bug documented at `functions/enrich.py`); here
      ErrorList rows surface as all-NaN rows in their own positions,
      the same null-shape `retrying_backend` uses.

    Throttling (ThrottlingException / TooManyRequestsException, by error
    code) maps to `TransientEnrichError` for the retry wrapper; other
    ClientErrors propagate. One boto3 client per backend instance, built
    lazily executor-side."""

    def backend(texts):
        import pandas as pd

        from .functions.enrich import TransientEnrichError

        if client_factory is None:
            boto3 = _need("boto3", "boto3")
            client = boto3.client("comprehend", region_name=region_name)
        else:
            client = client_factory()
        cols = ["Positive", "Negative", "Neutral", "Mixed"]
        vals = [t if isinstance(t, str) else "" for t in texts]
        out: list[tuple | None] = [None] * len(vals)
        for start in range(0, len(vals), _COMPREHEND_BATCH):
            batch = [t[:_COMPREHEND_MAX_CHARS] for t in vals[start : start + _COMPREHEND_BATCH]]
            try:
                resp = client.batch_detect_sentiment(
                    TextList=batch, LanguageCode=language_code
                )
            except Exception as ex:  # boto3 ClientError carries a code
                code = (
                    getattr(ex, "response", None) or {}
                ).get("Error", {}).get("Code", "")
                if code in ("ThrottlingException", "TooManyRequestsException"):
                    raise TransientEnrichError(str(ex)) from ex
                raise
            for item in resp.get("ResultList", []):
                s = item["SentimentScore"]
                out[start + item["Index"]] = tuple(s[c] for c in cols)
            # ErrorList rows keep their None slot -> all-NaN row below
        return pd.DataFrame(
            [r if r is not None else (float("nan"),) * 4 for r in out],
            columns=cols,
            index=texts.index,
        )

    return backend


# The fetch closures reference this module's record-shaping functions and
# are unpickled on executors whose cwd may not be the repo — ship the
# module source with the session like every other executor-side module.
from ._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
