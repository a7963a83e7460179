#!/usr/bin/env python3
"""Render bench/scale_r7.json (the 100x-span scale rehearsal) as a
markdown slope table: seconds at the small SF, seconds at the big SF,
wall ratio, and the per-decade growth exponent log100(ratio) — 1.0
would be perfectly linear in data size, < 1.0 sub-linear."""
import json
import math
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "bench/scale_r7.json"
d = json.load(open(path))
big = d["queries"]
small = d.get("queries_small_sf", {})
span = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
rows = []
for q in sorted(big, key=lambda q: -big[q]):
    if q not in small or small[q] <= 0:
        continue
    ratio = big[q] / small[q]
    expo = math.log(ratio) / math.log(span) if ratio > 0 else float("nan")
    rows.append((q, small[q], big[q], ratio, expo))
print(f"| query | sf0.01 s | ~sf1 s | wall ratio at {span:.0f}x data | growth exponent |")
print("|---|---|---|---|---|")
for q, s, b, r, e in rows:
    print(f"| {q} | {s:.2f} | {b:.2f} | {r:.2f}x | {e:.2f} |")
worst = max(rows, key=lambda t: t[3]) if rows else None
if worst:
    print(f"\nworst: {worst[0]} at {worst[3]:.2f}x wall for {span:.0f}x data "
          f"(exponent {worst[4]:.2f})")
