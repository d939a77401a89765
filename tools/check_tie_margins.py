"""Calibration-time float-tie margin gate (VERDICT r5 item 6).

Three oracle-gated queries compare exact rankings/assignments derived
from floating-point scores: `sim_bruteforce_topk` and `ts_profile_knn`
(cosine top-k — a k-boundary near-tie can order differently across
engines) and `x_kmeans` (argmin assignment — a near-equidistant vector
can flip clusters). Their NOTEs in __spark_entry__.py document that the
gates are only trustworthy while the decision margins on the ACTUAL
testdata stay far above float noise. This tool verifies that claim
mechanically instead of by eyeball: for each query it computes every
decision boundary's margin and FAILS (exit 1) if any falls below 1e-6 —
re-run it whenever the synthetic testdata is regenerated, BEFORE
trusting a gate mismatch on the three queries.

Run:  python tools/check_tie_margins.py [sf_dir ...]
      (defaults to all three /root/testdata SFs)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

MARGIN = 1e-6

_FAILURES = 0


def assert_margin(name: str, margins: np.ndarray, kind: str) -> None:
    """THE shared gate: every decision margin for `name` must clear
    MARGIN. Exact ties (margin == 0) are excluded — both engines break
    them with the same deterministic id/index rule; the danger zone is
    (0, MARGIN) where engines may disagree at ulp level."""
    global _FAILURES
    m = margins[margins > 0]
    worst = float(m.min()) if m.size else float("inf")
    exact = int((margins == 0).sum())
    ok = worst > MARGIN
    if not ok:
        _FAILURES += 1
    print(
        f"{'ok  ' if ok else 'FAIL'}  {name:22s} {kind:10s} "
        f"min-margin={worst:.3e} (threshold {MARGIN:.0e}, "
        f"{exact} exact ties, {len(margins)} boundaries)"
    )


def _knn_boundary_margins(con, scored_sql: str, k: int) -> np.ndarray:
    """Per-query gap between the k-th and (k+1)-th score."""
    rows = con.execute(
        f"""
        WITH scored AS ({scored_sql}),
        r AS (SELECT query_id, s,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY s DESC) AS rn
              FROM scored)
        SELECT a.s - b.s
        FROM r a JOIN r b ON a.query_id = b.query_id
        WHERE a.rn = {k} AND b.rn = {k + 1}
        """
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def check_sf(sf_dir: str) -> None:
    con = duckdb.connect()
    for t in ("events", "embeddings", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    print(f"-- {sf_dir}")

    # call site 1: sim_bruteforce_topk (k=5, probes vec_id < 10) — the
    # scored CTE is the oracle's own, minus the rank filter
    assert_margin(
        "sim_bruteforce_topk",
        _knn_boundary_margins(
            con,
            """
            SELECT q.vec_id AS query_id,
                   list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS s
            FROM embeddings q, embeddings c
            WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
            """,
            k=5,
        ),
        "k-boundary",
    )

    # call site 2: ts_profile_knn (k=5, probes user_id < 10) — the
    # oracle's hourly-profile build, then the same cosine boundary
    assert_margin(
        "ts_profile_knn",
        _knn_boundary_margins(
            con,
            """
            WITH sums AS (
              SELECT user_id, CAST(hour(ts) AS INT) AS h, round(sum(value), 6) AS v
              FROM events GROUP BY 1, 2
            ),
            dense AS (
              SELECT u.user_id, g.h, coalesce(s.v, 0.0) AS v
              FROM (SELECT DISTINCT user_id FROM events) u
              CROSS JOIN (SELECT CAST(unnest(range(24)) AS INT) AS h) g
              LEFT JOIN sums s ON s.user_id = u.user_id AND s.h = g.h
            ),
            vec AS (
              SELECT user_id, list(v ORDER BY h) AS e FROM dense GROUP BY user_id
            )
            SELECT q.user_id AS query_id,
                   list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS s
            FROM vec q, vec c
            WHERE q.user_id < 10
            """,
            k=5,
        ),
        "k-boundary",
    )

    # call site 3: x_kmeans (k=8, 3 rounds) — numpy replica of the
    # oracle's Lloyd's loop; every assign step's best-vs-second-best
    # RELATIVE distance margin (the NOTE's "1e-6 rel" claim)
    rows = con.execute(
        "SELECT embedding FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    cent = X[:8].copy()
    margins = []
    for _ in range(4):  # 3 update rounds + the final assignment
        d = np.linalg.norm(X[:, None, :] - cent[None, :, :], axis=2)
        part = np.partition(d, 1, axis=1)
        margins.append((part[:, 1] - part[:, 0]) / np.maximum(part[:, 0], 1e-30))
        a = np.argmin(d, axis=1)
        for c in range(8):
            if (a == c).any():
                cent[c] = X[a == c].mean(axis=0)
    assert_margin("x_kmeans", np.concatenate(margins), "assign-rel")

    # call site 4: sim_ivf_topk (r7 wave 4) — three decision boundaries
    # share the 1e-6 stance: (a) every corpus vector's cell argmax
    # (top-1 vs top-2 centroid dot, normalized scale), (b) each probe's
    # n_probe=4 cell cut (4th vs 5th), (c) the k=5 neighbor boundary
    # within the probed cells. Normalized dots live in [-1, 1], so the
    # absolute threshold matches the bruteforce stance.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from reddit_twitter_big_data_pipeline_spark.operators.similarity import centroid_codebook

    ids = np.array(
        [r[0] for r in con.execute(
            "SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id"
        ).fetchall()],
        dtype=np.int64,
    )
    cb = np.array(centroid_codebook(X.shape[1], 16, seed=7))
    Xn = X / np.maximum(np.linalg.norm(X, axis=1)[:, None], 1e-12)
    dots = Xn @ cb.T  # n × 16, normalized scale
    srt = np.sort(dots, axis=1)[:, ::-1]
    assert_margin("sim_ivf_topk", srt[:, 0] - srt[:, 1], "cell-argmax")
    probe_mask = ids < 10
    assert_margin("sim_ivf_topk", srt[probe_mask, 3] - srt[probe_mask, 4], "probe-cut")
    cell = np.argmax(dots, axis=1)
    pcells = np.argsort(-dots[probe_mask], axis=1, kind="stable")[:, :4]
    kb = []
    for j, qi in enumerate(np.nonzero(probe_mask)[0]):
        cand = np.isin(cell, pcells[j]) & (ids != ids[qi])
        sims = np.sort(Xn[cand] @ Xn[qi])[::-1]
        if len(sims) > 5:
            kb.append(sims[4] - sims[5])
    assert_margin("sim_ivf_topk", np.array(kb), "k-boundary")

    # call site 5 (r8): the percentile-threshold quality gates — row
    # membership flips on `q >= thr`, a float cut between a per-row double
    # and an interpolated 75th percentile the two engines each compute
    # themselves. The margin is every row's |q − thr| within its group.
    # The oracles' OWN CTEs are reused verbatim (everything before the
    # final SELECT), so the boundary measured IS the gate's boundary —
    # no duplicated formula to drift. Exact ties (q == thr, the
    # frac=0-interpolation case where both engines return the order
    # statistic itself bit-exactly) are excluded by assert_margin's rule.
    import __spark_entry__ as E

    oracles = E.oracle_sql()
    for qname, rows_cte, grp in (
        ("text_quality_gate", "scored", "lang"),
        ("text_langid_gate", "quality", "lang_pred"),
    ):
        sql = oracles[qname]
        head = sql[: sql.rindex("SELECT")]
        m = con.execute(
            head
            + f"SELECT s.q - thr.t AS m FROM {rows_cte} s JOIN thr USING ({grp})"
        ).fetchnumpy()["m"]
        assert_margin(qname, np.abs(np.asarray(m, dtype=np.float64)), "gate-cut")

    # call site 6 (r9): train_curation_v2's integer micro-unit quality cut
    # — floor(q·1e6) >= 150000. floor of an identically-computed double is
    # binary-exact in both engines, so the ONLY hazard is a 1-ulp double
    # divergence landing q·1e6 on opposite sides of the 150000 boundary;
    # the margin is each gated row's |q·1e6 − 150000| (rows on BOTH
    # sides of the cut — r10: the gate moved above the quota per ADVICE
    # r9, so it now reads keptbl and every candidate row is measured).
    # The q expression is SLICED OUT of the oracle's own qual CTE
    # (between 'floor(' and ')::BIGINT'), so there is no duplicated
    # formula to drift — the boundary measured IS the gate's boundary.
    sql = oracles["train_curation_v2"]
    head = sql[: sql.index("qual AS")]
    fstart = sql.index("floor(", sql.index("qual AS")) + len("floor(")
    fend = sql.index(")::BIGINT", fstart)
    qexpr = sql[fstart:fend]
    m = con.execute(
        head + f"sel AS (SELECT ({qexpr}) - 150000.0 AS m FROM keptbl) SELECT m FROM sel"
    ).fetchnumpy()["m"]
    assert_margin(
        "train_curation_v2", np.abs(np.asarray(m, dtype=np.float64)), "quality-cut"
    )

    # call site 7 (r9): text_domain_quality_gate's cross-multiplied mean
    # cut — sum(q_micro) >= 150000·n per domain. Each row's q_micro is
    # an identically-computed floor'd integer in both engines, so the
    # domain SUM is exact; the hazard is again a per-row 1-ulp
    # divergence flipping one floor and moving a domain's sum across
    # the cut. Margin = |sum(q_micro) − 150000·n| per domain, measured
    # from the oracle's own qm CTE (head reused verbatim).
    sql = oracles["text_domain_quality_gate"]
    head = sql[: sql.index("good AS")]
    m = con.execute(
        head
        + """gm AS (
              SELECT CAST(sum(q_micro) AS DOUBLE) - 150000.0 * count(*) AS m
              FROM qm GROUP BY domain
            ) SELECT m FROM gm"""
    ).fetchnumpy()["m"]
    assert_margin(
        "text_domain_quality_gate",
        np.abs(np.asarray(m, dtype=np.float64)),
        "mean-cut",
    )

    # call site 8 (r9): sim_pq_topk — two float decision families: the
    # per-(row, subspace) code ARGMAX over 16 centroid dots, and the
    # per-probe ADC k-boundary (5th vs 6th approximate score). Exact-code
    # ties produce EXACTLY equal ADC sums in both engines (fixed-order
    # 4-term expression) and break by neighbor_id — assert_margin's
    # exact-tie exclusion covers them; the danger zone is distinct-code
    # near-ties at ulp scale.
    from reddit_twitter_big_data_pipeline_spark.operators.similarity import pq_codebooks

    C = [np.array(cj) for cj in pq_codebooks(64, m=4, n_centroids=16, seed=11)]
    Xn2 = X / np.maximum(np.linalg.norm(X, axis=1)[:, None], 1e-12)
    code_margins, luts, codes = [], [], []
    qmask = ids < 10
    qn = np.maximum(np.linalg.norm(X[qmask], axis=1), 1e-12)
    for j, Cj in enumerate(C):
        d = Xn2[:, j * 16 : (j + 1) * 16] @ Cj.T
        srt = np.sort(d, axis=1)[:, ::-1]
        code_margins.append(srt[:, 0] - srt[:, 1])
        codes.append(np.argmax(d, axis=1))
        luts.append(X[qmask][:, j * 16 : (j + 1) * 16] @ Cj.T)
    assert_margin(
        "sim_pq_topk", np.concatenate(code_margins), "code-argmax"
    )
    adc = np.zeros((X.shape[0], int(qmask.sum())))
    for j in range(4):
        adc += luts[j][:, codes[j]].T
    adc = adc / qn[None, :]
    kb = []
    for qi, gi in enumerate(np.nonzero(qmask)[0]):
        s = np.sort(np.delete(adc[:, qi], gi))[::-1]
        kb.append(s[4] - s[5])
    assert_margin("sim_pq_topk", np.array(kb), "k-boundary")

    # call site 9 (r10): sim_ivfpq_topk — the composition's decision
    # boundaries are the UNION of site 4's (cell argmax + probe cut,
    # same coarse codebook literals) and site 8's (code argmax), both
    # already asserted above on this data; the one NEW boundary is the
    # k=5 cut of ADC scores restricted to each probe's 4 probed cells
    # (a different candidate set than site 8's whole-corpus cut).
    kb9 = []
    for qi, gi in enumerate(np.nonzero(qmask)[0]):
        cand = np.isin(cell, pcells[qi]) & (ids != ids[gi])
        s = np.sort(adc[cand, qi])[::-1]
        if len(s) > 5:
            kb9.append(s[4] - s[5])
    assert_margin("sim_ivfpq_topk", np.array(kb9), "k-boundary")
    con.close()


def main() -> int:
    dirs = sys.argv[1:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    for d in dirs:
        check_sf(d)
    return 1 if _FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())
