"""Compare two bench artifacts (BENCH_r*_local.json) on their overlapping
per-query timings: sum ratio, median per-query ratio, and the largest
movers each way — CANARY-NORMALIZED (VERDICT r12 item 5). Pure analysis,
no Spark.

Both artifacts carry interleaved constant-work canary probes (bench.py's
`_canary`). The ratio of the two runs' canary MEDIANS estimates the
ambient-load shift between their windows: dividing every per-query ratio
by it removes the window-level drift this box is known for (BASELINE.md
r5/r6: untouched queries swing 1.5-4x between same-day runs), so what
remains is per-query movement relative to the machine, not the weather.
Artifacts predating the canary (r11 and earlier) compare raw, flagged as
`canary_normalized: false`.

Adjudication: only queries whose NORMALIZED ratio leaves the [1/band,
band] envelope (default band 2.0 — ambient per-query noise survives
normalization; the canary only removes the shared shift) are listed as
`flagged_regressions` / `flagged_wins`, with a top-level verdict line.
A flagged query still needs an interleaved A/B (tools/ab_*.py /
tools/adjudicate_movers.py) before it counts — this tool ranks where to
point the A/B, it does not replace one.

Usage: python tools/bench_compare.py NEW.json OLD.json [top_n] [band]
"""

from __future__ import annotations

import json
import statistics
import sys


def _raw(artifact: dict) -> dict[str, float]:
    """Headline + full-surface + scaled timings merged; headline wins on
    overlap (min-of-reps beats the tail's single-shot timing). The
    `scaled` rows (e.g. train_curation_v2_16x, the r13 data-cost-
    dominated curation comparison point) are first-class here — dropping
    them would exclude exactly the row built to be compared."""
    out = dict(artifact.get("full_surface") or {})
    out.update(artifact.get("scaled") or {})
    out.update(artifact.get("queries") or {})
    return {q: t for q, t in out.items() if isinstance(t, (int, float))}


def _timings(artifact: dict) -> dict[str, float]:
    return {q: t for q, t in _raw(artifact).items() if t > 0}


def _errored(artifact: dict) -> list[str]:
    """Queries the run attempted but recorded as failed (bench.py writes
    -1.0 on exception). Kept OUT of the ratio math but reported: a
    regression-to-failure must not masquerade as a de-registered query
    in only_old."""
    return sorted(q for q, t in _raw(artifact).items() if t <= 0)


def compare(new: dict, old: dict, top_n: int = 8, band: float = 2.0) -> dict:
    tn, to = _timings(new), _timings(old)
    common = sorted(set(tn) & set(to))
    if not common:
        return {"error": "no overlapping queries"}
    c_new = (new.get("canary") or {}).get("median")
    c_old = (old.get("canary") or {}).get("median")
    normalized = bool(c_new and c_old)
    c_ratio = (c_new / c_old) if normalized else 1.0
    ratios = {q: tn[q] / to[q] for q in common}
    norm = {q: r / c_ratio for q, r in ratios.items()}
    movers = sorted(norm.items(), key=lambda kv: kv[1])

    def _row(q: str) -> dict:
        return {
            "q": q,
            "norm_ratio": round(norm[q], 3),
            "raw_ratio": round(ratios[q], 3),
            "new": round(tn[q], 2),
            "old": round(to[q], 2),
        }

    sum_ratio = sum(tn[q] for q in common) / sum(to[q] for q in common)
    norm_sum = sum_ratio / c_ratio
    regressions = [_row(q) for q, r in movers[::-1] if r > band]
    wins = [_row(q) for q, r in movers if r < 1.0 / band]
    if norm_sum <= 0.95:
        verdict = f"net FASTER (canary-normalized sum ratio {norm_sum:.3f})"
    elif norm_sum < 1.05:
        verdict = f"flat (canary-normalized sum ratio {norm_sum:.3f})"
    else:
        verdict = f"net SLOWER (canary-normalized sum ratio {norm_sum:.3f})"
    if not normalized:
        verdict += " [RAW: one artifact has no canary]"
    if _errored(new):
        verdict += f" [ERRORED in new run: {', '.join(_errored(new))}]"
    return {
        "verdict": verdict,
        "canary_normalized": normalized,
        "canary_median_new": c_new,
        "canary_median_old": c_old,
        "canary_ratio": round(c_ratio, 3),
        "canary_spread_new": (new.get("canary") or {}).get("spread"),
        "canary_spread_old": (old.get("canary") or {}).get("spread"),
        "overlap": len(common),
        "sum_new": round(sum(tn[q] for q in common), 2),
        "sum_old": round(sum(to[q] for q in common), 2),
        "sum_ratio_raw": round(sum_ratio, 3),
        "sum_ratio_normalized": round(norm_sum, 3),
        "median_ratio_raw": round(statistics.median(ratios.values()), 3),
        "median_ratio_normalized": round(statistics.median(norm.values()), 3),
        "band": band,
        "flagged_regressions": regressions[:top_n],
        "flagged_wins": wins[:top_n],
        "fastest_movers": [_row(q) for q, _ in movers[:top_n]],
        "slowest_movers": [_row(q) for q, _ in movers[-top_n:][::-1]],
        "errored_new": _errored(new),
        "errored_old": _errored(old),
        # a query that ERRORED in the other run is not "only" anywhere —
        # an error in new would otherwise masquerade as a de-registration
        "only_new": sorted(set(tn) - set(to) - set(_errored(old))),
        "only_old": sorted(set(to) - set(tn) - set(_errored(new))),
    }


def main() -> None:
    new_path, old_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    band = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    out = compare(json.load(open(new_path)), json.load(open(old_path)), top_n, band)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
