"""Graph-as-tables model — SURVEY §2.2 K3-K6, FIXTURES.md §5.

The reference upserts a Neo4j property graph one Cypher transaction per row
(reference: glue/reddit_glue.py:70-126, glue/twitter_glue.py:74-105). The
engine represents the same graph as two DataFrames:

    nodes(node_id, label, props map<string,string>)
    edges(src, dst, rel_type)

Every Cypher MERGE becomes distinct/dropDuplicates on the natural key; every
MATCH becomes an inner join; the mentions FOREACH fan-out becomes
explode(split(...)). Graph queries downstream are joins/aggregations — the
reference has no query that needs more (SURVEY §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators import cleanse, model


def _props(df: DataFrame, cols: list[str]) -> F.Column:
    """Pack payload columns into the props map (stringly, like the property
    graph; numeric re-casts happen at read via map_get + cast)."""
    pairs = []
    for c in cols:
        pairs.extend([F.lit(c), F.col(c).cast("string")])
    return F.create_map(*pairs)


def _nodes(df: DataFrame, id_col: F.Column, label: str, prop_cols: list[str]) -> DataFrame:
    return (
        df.select(
            id_col.cast("string").alias("node_id"),
            F.lit(label).alias("label"),
            _props(df, prop_cols).alias("props"),
        )
        .filter(F.col("node_id").isNotNull())
        .dropDuplicates(["node_id", "label"])
    )


def _edges(df: DataFrame, src: F.Column, dst: F.Column, rel: str) -> DataFrame:
    return (
        df.select(
            src.cast("string").alias("src"),
            dst.cast("string").alias("dst"),
            F.lit(rel).alias("rel_type"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .dropDuplicates(["src", "dst", "rel_type"])
    )


def reddit_graph(posts: DataFrame, comments: DataFrame) -> tuple[DataFrame, DataFrame]:
    """K3+K4: post/comment/user/subreddit nodes and POSTED_IN / POSTED_BY /
    COMMENTED_ON / COMMENTED_BY edges.

    MERGE-per-row → distinct per natural key (A1/A2); the Cypher
    `MATCH (p {id:$postId})` comment attachment → inner join, orphans dropped
    (A3, reference: glue/reddit_glue.py:92-109).

    Unlike the reference's write loop — which leaks the LAST post's topic and
    sentiment into every comment (reference: glue/reddit_glue.py:122-124,
    documented bug, SURVEY §3.2) — comments keep their own enrichment here.
    """
    post_props = [c for c in posts.columns if c != "id"]
    comment_props = [c for c in comments.columns if c != "id"]
    # MATCH-drop semantics: the reference's comment Cypher MERGEs the comment
    # node, its user node, and both edges in ONE query that starts with
    # `MATCH (p1:Post_Reddit {id: $postId})` — an orphaned comment therefore
    # contributes NOTHING, nodes included (glue/reddit_glue.py:92-109).
    attached = model.fk_join(
        comments, posts.select(F.col("id").alias("p_id")), "post_id", "p_id"
    )

    nodes = model.union_sources(
        _nodes(posts, F.col("id"), "Post_Reddit", post_props),
        _nodes(attached, F.col("id"), "Comment_Reddit", comment_props),
        _nodes(posts.select(F.col("username")), F.col("username"), "User_Reddit", []),
        _nodes(attached.select(F.col("username")), F.col("username"), "User_Reddit", []),
        _nodes(posts.select(F.col("subreddit")), F.col("subreddit"), "Subreddit_Reddit", []),
    ).dropDuplicates(["node_id", "label"])

    edges = model.union_sources(
        _edges(posts, F.col("id"), F.col("subreddit"), "POSTED_IN"),
        _edges(posts, F.col("id"), F.col("username"), "POSTED_BY"),
        _edges(attached, F.col("id"), F.col("p_id"), "COMMENTED_ON"),
        _edges(attached, F.col("id"), F.col("username"), "COMMENTED_BY"),
    )
    return nodes, edges


def twitter_graph(tweets: DataFrame) -> tuple[DataFrame, DataFrame]:
    """K5+K6: Tweet / User_Twitter nodes, MENTIONS fan-out edges.

    The Cypher FOREACH-over-SPLIT (reference: glue/twitter_glue.py:92-94) and
    the loader's 4-way null dispatch (reference:
    neo4j_insert/neo4j_twitter_insert.py:60-82) collapse into explode(), which
    emits zero rows for null/empty arrays. Expects `mentionedUsers` already
    parsed to array (cleanse.parse_mentions).
    """
    tweet_props = [c for c in tweets.columns if c not in ("id", "mentionedUsers")]
    mentions = cleanse.explode_mentions(tweets)

    nodes = model.union_sources(
        _nodes(tweets, F.col("id"), "Tweet", tweet_props),
        _nodes(tweets.select(F.col("username")), F.col("username"), "User_Twitter", []),
        _nodes(mentions.select(F.col("mentioned_user")), F.col("mentioned_user"), "User_Twitter", []),
        _nodes(
            tweets.filter(F.col("inReplyToUser").isNotNull()).select(F.col("inReplyToUser")),
            F.col("inReplyToUser"),
            "User_Twitter",
            [],
        ),
    ).dropDuplicates(["node_id", "label"])

    edges = model.union_sources(
        _edges(tweets, F.col("id"), F.col("username"), "POSTED_BY"),
        _edges(mentions, F.col("id"), F.col("mentioned_user"), "MENTIONS"),
        _edges(
            tweets.filter(F.col("inReplyToUser").isNotNull()),
            F.col("id"),
            F.col("inReplyToUser"),
            "IN_REPLY_TO",
        ),
    )
    return nodes, edges
