#!/usr/bin/env python3
"""Summarize a TimeOne sweep log: distribution buckets + a sorted tail.

Usage: parse_sweep.py <sweep_log> [tail_n]
Reads lines of the form
  qNN_name warm=W rounds=[r1, ...] min=M
and prints the min-time distribution (<=3s / 3-15s / >15s), the slowest
tail_n queries, and a machine-readable one-line-per-query dump sorted by
name for diffing across rounds.
"""
import re
import sys

path = sys.argv[1]
tail_n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
rows = []
for line in open(path):
    m = re.match(r"(q\S+) warm=([\d.]+) rounds=\[([^\]]*)\] min=([\d.]+)", line.strip())
    if m:
        rows.append((m.group(1), float(m.group(2)), float(m.group(4))))

rows.sort(key=lambda r: -r[2])
le3 = sum(1 for r in rows if r[2] <= 3)
mid = sum(1 for r in rows if 3 < r[2] <= 15)
gt15 = sum(1 for r in rows if r[2] > 15)
print(f"queries={len(rows)}  <=3s: {le3}  3-15s: {mid}  >15s: {gt15}  "
      f"sum_min={sum(r[2] for r in rows):.1f}s")
print(f"\nslowest {tail_n}:")
for name, warm, mn in rows[:tail_n]:
    print(f"  {name:34s} min={mn:7.2f}  warm={warm:7.2f}")
print("\nall (sorted by name):")
for name, warm, mn in sorted(rows):
    print(f"  {name} min={mn:.3f} warm={warm:.3f}")
