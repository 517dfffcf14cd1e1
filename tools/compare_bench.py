#!/usr/bin/env python3
"""Compare two Bench JSON lines (full per-query maps): total ratio and
per-query ratios, for the bench-reproducibility receipt (VERDICT r7 #2:
consecutive runs on identical code should agree within ~10% on totals
with per-query max ratio < 1.5x).

Usage: compare_bench.py run1.json run2.json [min_ms]
  min_ms (default 200): ignore queries faster than this in BOTH runs —
  sub-threshold queries are jitter-dominated and not regression signal.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line found in {path}")


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    min_s = (float(sys.argv[3]) if len(sys.argv) > 3 else 200.0) / 1000.0
    # bench_full.json per-query values are MILLISECONDS (qunit)
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    ta, tb = sum(qa[q] for q in common) / 1000.0, sum(qb[q] for q in common) / 1000.0
    print(f"common queries: {len(common)}")
    print(f"totals: {ta:.2f} s vs {tb:.2f} s  ratio {max(ta, tb) / min(ta, tb):.3f}")
    worst = []
    for q in common:
        x, y = qa[q], qb[q]
        if max(x, y) < min_s * 1000.0:
            continue
        r = max(x, y) / max(min(x, y), 1e-9)
        worst.append((r, q, x, y))
    worst.sort(reverse=True)
    over = [w for w in worst if w[0] >= 1.5]
    print(f"queries >= {min_s*1000:.0f} ms in a run: {len(worst)}; ratio >= 1.5x: {len(over)}")
    for r, q, x, y in worst[:10]:
        print(f"  {q:32s} {x:8.0f} ms vs {y:8.0f} ms  x{r:.2f}")


if __name__ == "__main__":
    main()
