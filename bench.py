"""Benchmark harness (driver contract): run the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
collect-to-driver cost in the measurement). Timings are wall-clock per query;
`value` is the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The headline set: flagship pipeline + one representative per operator
# family (scan/filter, join, window, rollup, enrichment UDFs, dedup family,
# similarity, text analysis, graph model).
HEADLINE = [
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_local_suppliers",
    "tpch_q13_order_distribution",
    "tpch_q18_large_orders",
    "tpch_q21_sole_returner",
    "a3_fk_join",
    "a4_comment_depth",
    "a7_top_n_per_group",
    "temporal_asof_join",
    "temporal_range_join",
    "w2_tumbling_window",
    "w6_sessionize",
    "x_window_rank",
    "social_twitter_edges",
    "social_enriched_tweets",
    "dedup_exact_keep",
    "dedup_minhash_pairs",
    "dedup_jaccard_pairs",
    "dedup_simhash_pairs",
    "dedup_editdist_pairs",
    "sim_bruteforce_topk",
    "sim_ann_topk",
    "emb_near_dup",
    "text_profile",
    "text_quality_gopher",
    "text_quality_gate",
    "text_decontaminate",
    "sem_dedup_pairs",
    "media_features",
    "media_frame_sample",
]


def main() -> None:
    import __spark_entry__ as E
    from reddit_twitter_big_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    sf_label = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf_label)
    except ValueError:
        sf = sf_label

    qs = E.queries()
    # JVM/codegen warmup: run one trivial job + one tiny real query before
    # the clock starts, so the first timed query measures itself rather than
    # JIT compilation and executor spin-up (standard bench practice; the
    # warmup touches none of the headline inputs at timing scale).
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    try:
        qs["a6_count_groups"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as ex:  # noqa: BLE001
            print(f"bench error {name}: {ex}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
