#!/usr/bin/env python3
"""Per-query bench regression check between two BENCH_r{N}.json files.

Usage: python3 tools/bench_compare.py <baseline.json> <current.json> [ratio]

Flags queries whose time grew more than `ratio` (default 1.5×) over the
baseline, ignoring sub-0.3 s queries where scheduler jitter dominates.
Host noise can spike a single query ~10× transiently — rerun before
believing a regression. Exit code 1 if any flagged.
"""
import sys, json, re

def load(path):
    """Accept either the raw Bench JSON line or the driver's BENCH_r{N}
    wrapper, whose 'tail' holds the (possibly head-truncated) stdout —
    per-query times are regex-recovered from it."""
    d = json.load(open(path))
    if "queries" in d:
        return d
    tail = d.get("tail", "")
    qs = {m.group(1): float(m.group(2))
          for m in re.finditer(r'"(q\w+)":([0-9.]+)', tail)}
    m = re.search(r'"metric":"total","value":([0-9.]+)', tail)
    return {"queries": qs, "value": float(m.group(1)) if m else None}

def main():
    base_p, cur_p = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    base = load(base_p)
    cur = load(cur_p)
    bq, cq = base.get("queries", {}), cur.get("queries", {})
    flagged, improved = [], []
    for name in sorted(cq):
        if name not in bq:
            print(f"NEW  {name}: {cq[name]:.2f}s (no baseline)")
            continue
        b, c = bq[name], cq[name]
        if b < 0.3 and c < 0.3:
            continue
        r = c / b if b > 0 else float("inf")
        if r > ratio:
            flagged.append((name, b, c, r))
        elif r < 1 / ratio:
            improved.append((name, b, c, r))
    for name in sorted(set(bq) - set(cq)):
        print(f"GONE {name}: was {bq[name]:.2f}s, missing from current")
    for name, b, c, r in improved:
        print(f"FASTER {name}: {b:.2f}s -> {c:.2f}s ({r:.2f}x)")
    for name, b, c, r in flagged:
        print(f"REGRESSION {name}: {b:.2f}s -> {c:.2f}s ({r:.2f}x)")
    tb, tc = base.get("value"), cur.get("value")
    if tb and tc:
        print(f"\ntotal: {tb:.1f}s -> {tc:.1f}s ({tc/tb:.2f}x), "
              f"{len(flagged)} regression(s) > {ratio}x")
    sys.exit(1 if flagged else 0)

if __name__ == "__main__":
    main()
