"""Scale-stress the local-fast-path / global-iterative-path boundary
(VERDICT r5 item 4).

k_core and connected_components finish task-local below
local_threshold=2M symmetrized edges and fall back to the global
iterative path above it. The unit suites force the global path with
local_threshold=0 on toy graphs; this script exercises it at REAL scale:
the sf0.1 bench graphs are replicated with disjoint id offsets until the
symmetrized edge count exceeds the DEFAULT threshold, the operators run
with default parameters (so the size check itself routes to the global
path), and the result is compared EXACTLY against the offset-shifted
local-path truth — every copy is a disconnected component, so the big
graph's answer is the base answer replicated per offset.

Run:  python tools/stress_global_paths.py [sf_dir]
Exit: 0 on exact parity for both operators, 1 otherwise.
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from reddit_twitter_big_data_pipeline_spark import schemas, session  # noqa: E402
from reddit_twitter_big_data_pipeline_spark.operators import dedup, model  # noqa: E402

THRESHOLD = 2_000_000  # the operators' default local_threshold
OFFSET = 1_000_000  # far above any suppkey at these SFs


def _co_pairs(li, a: str, b: str):
    """The x_kcore / x_connected_components supplier co-fulfillment
    derivation (same-order suppkey pairs, canonical a < b)."""
    return (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_suppkey") < F.col("y.l_suppkey"))
        .select(F.col("x.l_suppkey").alias(a), F.col("y.l_suppkey").alias(b))
        .distinct()
    )


def _replicate(df, copies: int, shift_cols: list[str], keep_cols: list[str] = ()):
    """Copy df `copies` times, shifting ID columns by a per-copy offset and
    passing value columns (e.g. k_core's degree) through untouched."""
    rep = df.sparkSession.range(copies).select(
        (F.col("id") * OFFSET).alias("__off")
    )
    return df.crossJoin(rep).select(
        *[(F.col(c) + F.col("__off")).alias(c) for c in shift_cols],
        *keep_cols,
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = session.get_spark("stress-global-paths")
    li = schemas.load_table(spark, sf_dir, "lineitem")
    failures = 0

    for name, qty, runner, shift_cols, keep_cols in (
        (
            "k_core(k=5)",
            47,
            lambda e: model.k_core(e, k=5),
            ["node"],
            ["degree"],
        ),
        (
            "connected_components",
            49,
            lambda e: dedup.connected_components(e, a_col="src", b_col="dst", max_iter=40),
            ["node", "component"],
            [],
        ),
    ):
        base = _co_pairs(
            li.filter(F.col("l_quantity") > qty).select("l_orderkey", "l_suppkey"),
            "src",
            "dst",
        ).cache()
        n_base = base.count()
        # symmetrized edges ≈ 2 × directed pairs; size past the threshold
        # with ~10% headroom so the operator's own count() routes global
        copies = math.ceil(THRESHOLD * 1.1 / (2 * n_base))
        big = _replicate(base, copies, ["src", "dst"]).cache()
        n_big_sym = 2 * big.count()
        assert n_big_sym > THRESHOLD, (
            f"{name}: replicated graph ({n_big_sym} symmetrized) does not "
            f"exceed local_threshold — raise copies"
        )
        t0 = time.time()
        got = runner(big).cache()
        n_got = got.count()
        dt = round(time.time() - t0, 1)
        # truth: the base result (local fast path — parity-pinned at unit
        # scale and driver-graded at bench scale) shifted per copy
        truth = _replicate(runner(base), copies, shift_cols, keep_cols).cache()
        n_truth = truth.count()
        n_diff = got.exceptAll(truth).count() + truth.exceptAll(got).count()
        status = "PARITY" if n_diff == 0 and n_got == n_truth else "MISMATCH"
        if status == "MISMATCH":
            failures += 1
        print(
            f"{status}  {name}: base={n_base} directed edges x{copies} copies "
            f"-> {n_big_sym} symmetrized (> {THRESHOLD}), global path "
            f"{dt}s, rows got={n_got} truth={n_truth} diff={n_diff}",
            flush=True,
        )
        for c in (base, big, got, truth):
            c.unpersist()

    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
