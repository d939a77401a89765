"""Compare two bench artifacts (BENCH_r*_local.json) on their overlapping
per-query timings: sum ratio, median per-query ratio, and the largest
movers each way. Pure analysis — no Spark.

Interpretation guard: this box's ambient band swings individual queries
1.5-4x between same-day runs on identical code (BASELINE.md r5/r6), so a
sum/median near 1.0 is "flat" and any single-query mover needs an
interleaved A/B (tools/ab_*.py / tools/adjudicate_movers.py) before it
counts as a regression or a win.

Usage: python tools/bench_compare.py NEW.json OLD.json [top_n]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    new_path, old_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    new = json.load(open(new_path)).get("queries", {})
    old = json.load(open(old_path)).get("queries", {})
    common = sorted(set(new) & set(old))
    if not common:
        print(json.dumps({"error": "no overlapping queries"}))
        return
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    movers = sorted(ratios.items(), key=lambda kv: kv[1])
    out = {
        "overlap": len(common),
        "sum_new": round(sum(new[q] for q in common), 2),
        "sum_old": round(sum(old[q] for q in common), 2),
        "sum_ratio": round(sum(new[q] for q in common) / sum(old[q] for q in common), 3),
        "median_ratio": round(statistics.median(ratios.values()), 3),
        "only_new": sorted(set(new) - set(old)),
        "only_old": sorted(set(old) - set(new)),
        "fastest_movers": [
            {"q": q, "ratio": round(r, 3), "new": round(new[q], 2), "old": round(old[q], 2)}
            for q, r in movers[:top_n]
        ],
        "slowest_movers": [
            {"q": q, "ratio": round(r, 3), "new": round(new[q], 2), "old": round(old[q], 2)}
            for q, r in movers[-top_n:][::-1]
        ],
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
