"""Benchmark harness (driver contract): run the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
collect-to-driver cost in the measurement). Each query runs
$SPARK_GRAFT_BENCH_REPS times (default 3) and records the MINIMUM —
periodic external load on this box swings single timings 2-4×, so the min
is the clean number and the recorded artifact IS the claimed one (VERDICT
r2 item 5). `value` is the total of the minimums.
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
    # round-3 additions
    "text_segment_dedup",
    "sim_self_knn",
    "text_quality_classifier",
    "x_scd2_apply",
    "text_bm25_topk",
    "sim_quantized_topk",
    "x_resample_ffill",
    "x_cdc_apply",
    "x_rolling_zscore",
    "text_hybrid_rrf",
    "x_mad_outliers",
    # round-4 additions: the newly oracle-gated iterative peel, the BPE
    # merge-selection primitives, fixed-round k-means, and exact heavy
    # hitters
    "x_kcore",
    "text_word_counts",
    "text_bpe_merge_select",
    "x_kmeans",
    "x_heavy_hitters",
    # round-5 additions: the rotated-in iterative/incremental operators and
    # the Zipfian skew pair (salted vs unsalted join-feeds-agg — recorded
    # side by side so the salting win/cost is tracked round-over-round)
    "x_connected_components",
    "dedup_incremental_pairs",
    "text_bpe_train_small",
    "x_skew_agg_unsalted",
    "x_skew_agg_salted",
    # late round-5 additions (first recorded baselines: 2.8 / 6.2 / 1.1 s)
    "dedup_containment_pairs",
    "sample_split_leakproof",
    "ts_profile_knn",
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
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # JVM/codegen warmup on SYNTHETIC data only: the first timed query then
    # measures itself rather than JIT compilation and executor spin-up,
    # while no headline input's page cache is pre-warmed asymmetrically
    # (rep 1 is everyone's cold run; the min-of-reps records the warm one).
    spark.range(10_000_000).selectExpr("sum(id)", "count(distinct id % 1000)").write.format(
        "noop"
    ).mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        best = -1.0
        for _ in range(reps):
            t0 = time.time()
            try:
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                best = dt if best < 0 else min(best, dt)
            except Exception as ex:  # noqa: BLE001
                print(f"bench error {name}: {ex}", file=sys.stderr)
                break
        timings[name] = best
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
