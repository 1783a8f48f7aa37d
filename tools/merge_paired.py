#!/usr/bin/env python3
"""Merge per-(query, sf) artifacts from tools/paired_scale_bench.sh into
one BENCH_sfN.json with a paired map — the BENCH_sf1.json convention:
same host, back-to-back, fresh JVM per measurement.

Usage: tools/merge_paired.py <out_dir> <tagA> <tagB> <dest.json> [host_note]
  tagA = basename of the smaller SF dir (the paired_* map)
  tagB = basename of the measured SF dir (the headline queries map)
"""
import json, glob, os, socket, sys

out_dir, tag_a, tag_b, dest = sys.argv[1:5]
note = sys.argv[5] if len(sys.argv) > 5 else ""

def load(tag):
    m = {}
    for f in glob.glob(os.path.join(out_dir, f"*_{tag}.json")):
        try:
            d = json.load(open(f))
            for k, v in d.get("queries", {}).items():
                if v >= 0:
                    m[k] = v
        except Exception as e:
            print(f"[merge] skip {f}: {e}", file=sys.stderr)
    return m

a, b = load(tag_a), load(tag_b)
shared = sorted(set(a) & set(b))
ratios = {q: round(b[q] / a[q], 2) for q in shared if a[q] > 0}
doc = {
    "metric": "total",
    "value": round(sum(b.values()), 3),
    "unit": "sec",
    "queries": {q: round(b[q], 3) for q in sorted(b)},
    "sf": tag_b,
    f"paired_{tag_a}": {q: round(a[q], 3) for q in sorted(a)},
    "ratios_vs_" + tag_a: ratios,
    "host_note": note,
    "host": {"name": socket.gethostname(), "cpus": os.cpu_count()},
}
json.dump(doc, open(dest, "w"), indent=1)
med = sorted(ratios.values())[len(ratios) // 2] if ratios else None
print(f"[merge] {len(b)} measured @ {tag_b}, {len(shared)} paired with {tag_a}, "
      f"median ratio {med}x -> {dest}")
