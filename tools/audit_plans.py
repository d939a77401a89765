"""Whole-surface physical-plan sweep: build every registered query's plan
and report cartesian/nested-loop joins, exchange counts, and Python-UDF
stages — the tests in tests/test_plans.py pin curated invariants; this tool
sweeps the ENTIRE queries() surface so a new registration with a regressed
plan is caught the round it lands.

Usage: python tools/audit_plans.py [sf_dir] [query ...]

Exit status 1 if any NON-EXEMPT query plans a CartesianProduct or
BroadcastNestedLoopJoin. Exemptions (all 1-row broadcast stats frames or
k-sized bounded sides, documented at their registration):
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# BroadcastNestedLoopJoin over a deliberately bounded side (1-row corpus
# stats, k-row centroid/threshold frames) — not data×data cartesians.
NESTED_LOOP_EXEMPT = {
    "text_top_terms",        # 1-row (N docs) stats cross join (tf_idf)
    "text_bm25_topk",        # 1-row (avgdl, N) stats cross join
    "text_hybrid_rrf",       # composes bm25_topk
    "text_unigram_logprob",  # 1-row corpus-total cross join
    "text_bigram_logprob",   # 1-row corpus-total cross join (same stance)
    "text_importance_weights",  # two 1-row total frames (target + raw)
    "x_winsorize",           # 1-row exact-quantile bounds broadcast
    "text_quality_gate",     # per-language percentile threshold broadcast
    "train_curation",        # composes the curation chain incl. stats frames
    "sample_gumbel_topk",    # composes importance_weights
    "tpch_q22_idle_balance",   # 1-row avg(acctbal) scalar cross join
    "tpch_q11_important_stock",  # 1-row global-sum scalar cross join
    "x_hdr_quantiles",       # 3-row percentile frame broadcast cross join
    "x_join_size_est",       # 1-row theta frames broadcast cross join
    "text_domain_stats",     # 1-row corpus-total cross join (share column)
    "sample_water_fill",     # 1-row water-level (λ*) frame broadcast cross join
    "train_mixture_select",  # composes water_fill_allocation (same 1-row level)
}


def main() -> int:
    import __spark_entry__ as E
    from reddit_twitter_big_data_pipeline_spark.plans import audit
    from reddit_twitter_big_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=8)
    qs = E.queries()
    bad: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            s = audit.summarize(df)
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex}")
            bad.append(name)
            continue
        cart = s.get("CartesianProduct", 0)
        bnl = s.get("BroadcastNestedLoopJoin", 0)
        flag = ""
        if cart or (bnl and name not in NESTED_LOOP_EXEMPT):
            flag = "  <-- CARTESIAN"
            bad.append(name)
        elif bnl:
            flag = "  (exempt bounded-side BNLJ)"
        print(
            f"{name:32s} exchanges={s.get('Exchange', 0):2d} "
            f"bhj={s.get('BroadcastHashJoin', 0)} smj={s.get('SortMergeJoin', 0)} "
            f"cart={cart} bnlj={bnl}{flag}"
        )
    print(f"\n{len(bad)} offending queries" + (f": {bad}" if bad else ""))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
