#!/usr/bin/env python3
"""Per-query scaling table: t(10x)/t(1x) from the committed bench records.

Usage: python3 tools/scaling_table.py [BENCH_local.json] [BENCH_sf1_local.json]

Prints a markdown table sorted by growth ratio (descending) with a rough
classification: sub-linear (<3x), ~linear (3-12x for 10x data, allowing
fixed-overhead amortization either side), super-linear (>12x). The
thresholds are heuristics for eyeballing, not a gate.
"""
import json
import sys

base_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_local.json"
sf1_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1_local.json"

base = json.load(open(base_path))["queries"]
sf1 = json.load(open(sf1_path))["queries"]

rows = []
for name, t10 in sf1.items():
    t1 = base.get(name)
    if t1 is None or t1 <= 0 or t10 <= 0:
        continue
    rows.append((t10 / t1, name, t1, t10))
rows.sort(reverse=True)

print("| query | t(1x) s | t(10x) s | growth | class |")
print("|---|---|---|---|---|")
for r, name, t1, t10 in rows:
    klass = "super-linear" if r > 12 else ("~linear" if r >= 3 else "sub-linear")
    print(f"| {name} | {t1:.2f} | {t10:.2f} | {r:.1f}x | {klass} |")

sup = [n for r, n, _, _ in rows if r > 12]
print()
print(f"-- {len(rows)} queries compared; super-linear (>12x): "
      f"{', '.join(sup) if sup else 'none'}")
