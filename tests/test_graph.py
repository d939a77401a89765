"""Golden end-to-end tests for the graph model and social pipelines —
fixture rows shaped like the reference dumps (SURVEY §5 plan #3)."""

from __future__ import annotations

from reddit_twitter_big_data_pipeline_spark.operators import cleanse
from reddit_twitter_big_data_pipeline_spark.plans import graph, social

TWEETS = [
    # id, date, content, username, followers, mentionedUsers, rt, reply, inReplyTo, ts
    (1, "2023-03-25 10:00:00", "war update", "alice", 10, "bob,carol", 2, 0, None,
     "2023-03-25 10:00:00"),
    (2, "2023-03-25 10:01:00", "[deleted]", "dan", 5, None, 0, 0, None,
     "2023-03-25 10:00:00"),
    (3, "2023-03-25 10:02:00", "reply text", "bob", 7, None, 1, 1, "alice",
     "2023-03-25 10:00:00"),
]
TWEET_COLS = [
    "id", "date", "content", "username", "followersCount", "mentionedUsers",
    "retweetCount", "replyCount", "inReplyToUser", "timeStamp",
]


def test_twitter_graph_golden(spark):
    tweets = spark.createDataFrame(TWEETS, TWEET_COLS)
    nodes, edges = social.twitter_pipeline(tweets, enrichment=False)
    got_edges = sorted((r.src, r.dst, r.rel_type) for r in edges.collect())
    # tweet 2 is scrubbed ([deleted]); tweet 1 fans out 2 MENTIONS; tweet 3 has
    # a reply edge — the reference's 4-way null dispatch collapses to this.
    assert got_edges == [
        ("1", "alice", "POSTED_BY"),
        ("1", "bob", "MENTIONS"),
        ("1", "carol", "MENTIONS"),
        ("3", "alice", "IN_REPLY_TO"),
        ("3", "bob", "POSTED_BY"),
    ]
    got_nodes = sorted((r.node_id, r.label) for r in nodes.collect())
    assert got_nodes == [
        ("1", "Tweet"),
        ("3", "Tweet"),
        ("alice", "User_Twitter"),
        ("bob", "User_Twitter"),
        ("carol", "User_Twitter"),
    ]


def test_twitter_props_roundtrip(spark):
    tweets = cleanse.parse_mentions(spark.createDataFrame(TWEETS, TWEET_COLS))
    nodes, _ = graph.twitter_graph(tweets)
    t1 = {r.node_id: r.props for r in nodes.filter("label = 'Tweet'").collect()}["1"]
    assert t1["username"] == "alice"
    assert t1["followersCount"] == "10"  # stringly props map, cast at read


POSTS = [
    ("p1", "2023-03-25 09:00:00", "title", "body", "alice", 2, 10, "worldnews"),
    ("p2", "2023-03-25 09:30:00", "t2", "[deleted]", "bob", 0, 1, "news"),
]
POST_COLS = ["id", "date", "title", "content", "username", "commentCount", "score", "subreddit"]
COMMENTS = [
    ("c1", "2023-03-25 09:10:00", "reply 1", "carol", 3, "p1", "t3_p1"),
    ("c2", "2023-03-25 09:20:00", "reply 2", "AutoModerator", 1, "p1", "t1_c1"),
    ("c3", "2023-03-25 09:25:00", "orphan", "dan", 1, "p404", "t3_p404"),
]
COMMENT_COLS = ["id", "date", "content", "username", "score", "post_id", "parent_id"]


def test_reddit_graph_golden(spark):
    posts = spark.createDataFrame(POSTS, POST_COLS)
    comments = spark.createDataFrame(COMMENTS, COMMENT_COLS)
    nodes, edges = social.reddit_pipeline(posts, comments, enrichment=False)
    got = sorted((r.src, r.dst, r.rel_type) for r in edges.collect())
    # p2 scrubbed ([deleted]); c2 dropped (bot); c3 orphaned (inner-join MATCH
    # semantics, reference glue/reddit_glue.py:94-98)
    assert got == [
        ("c1", "carol", "COMMENTED_BY"),
        ("c1", "p1", "COMMENTED_ON"),
        ("p1", "alice", "POSTED_BY"),
        ("p1", "worldnews", "POSTED_IN"),
    ]
    labels = {(r.node_id, r.label) for r in nodes.collect()}
    assert ("p1", "Post_Reddit") in labels
    assert ("c1", "Comment_Reddit") in labels
    assert ("worldnews", "Subreddit_Reddit") in labels
    assert ("alice", "User_Reddit") in labels and ("carol", "User_Reddit") in labels
    # scrubbed/orphaned rows contribute no nodes — the reference's comment
    # Cypher starts with MATCH(post), so an orphan creates neither its
    # comment node nor its user node
    assert ("p2", "Post_Reddit") not in labels
    assert ("c3", "Comment_Reddit") not in labels
    assert ("dan", "User_Reddit") not in labels


def test_idempotent_rerun_same_graph(spark):
    """W5: replaying the same micro-batch yields the identical graph (MERGE
    semantics by construction)."""
    posts = spark.createDataFrame(POSTS + POSTS, POST_COLS)  # duplicated batch
    comments = spark.createDataFrame(COMMENTS + COMMENTS, COMMENT_COLS)
    _, edges_twice = social.reddit_pipeline(posts, comments, enrichment=False)
    _, edges_once = social.reddit_pipeline(
        spark.createDataFrame(POSTS, POST_COLS),
        spark.createDataFrame(COMMENTS, COMMENT_COLS),
        enrichment=False,
    )
    assert sorted(map(tuple, edges_twice.collect())) == sorted(map(tuple, edges_once.collect()))
