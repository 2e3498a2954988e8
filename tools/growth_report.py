#!/usr/bin/env python3
"""Growth report for the r19 scale matrix.

Usage:
  python3 tools/growth_report.py BENCH_sf1_full_r19.json BENCH_sf10_full_r19.json [scale]

Compares two same-protocol bench records (denominator first) and prints:
  - summary counts per growth class (scale defaults to 10x between records:
    sub-linear <3x, ~linear 3-12x, super-linear >12x; thresholds scale with
    the data ratio when `scale` is given, e.g. 1000 for sf0.1 -> sf100)
  - full markdown table sorted by growth, worst first
  - a separate list of super-linear rows for attribution work

The thresholds are eyeballing heuristics, not a gate; fixed per-row
overhead (session, planning, small-file reads) makes tiny rows look
sub-linear for free, which is why absolute seconds are printed alongside.
"""
import json
import sys

den_path, num_path = sys.argv[1], sys.argv[2]
scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
# class boundaries: ~linear means within [scale/3.3, 1.2*scale] roughly;
# keep the r18 convention at scale=10 (3 and 12) and scale it.
lo, hi = 3.0 * scale / 10.0, 12.0 * scale / 10.0

den = json.load(open(den_path))["queries"]
num = json.load(open(num_path))["queries"]

rows = []
for name, tn in num.items():
    td = den.get(name)
    if td is None or td <= 0 or tn <= 0:
        continue
    rows.append((tn / td, name, td, tn))
rows.sort(reverse=True)

sub = [r for r in rows if r[0] < lo]
lin = [r for r in rows if lo <= r[0] <= hi]
sup = [r for r in rows if r[0] > hi]
print(f"# growth {den_path} -> {num_path} (data x{scale:g})")
print(f"rows compared: {len(rows)}  |  sub-linear (<{lo:g}x): {len(sub)}"
      f"  |  ~linear ({lo:g}-{hi:g}x): {len(lin)}  |  super-linear (>{hi:g}x): {len(sup)}")
missing_n = sorted(set(den) - set(num))
missing_d = sorted(set(num) - set(den))
if missing_n:
    print(f"in denominator only ({len(missing_n)}): {', '.join(missing_n)}")
if missing_d:
    print(f"in numerator only ({len(missing_d)}): {', '.join(missing_d)}")
print()
if sup:
    print("## super-linear rows (attribution needed)")
    for g, name, td, tn in sup:
        print(f"  {name}: {td:.2f}s -> {tn:.2f}s  ({g:.1f}x)")
    print()
print("| query | t(base) s | t(scaled) s | growth | class |")
print("|---|---|---|---|---|")
for g, name, td, tn in rows:
    c = "super" if g > hi else ("linear" if g >= lo else "sub")
    print(f"| {name} | {td:.3f} | {tn:.3f} | {g:.2f}x | {c} |")
