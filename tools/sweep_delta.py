#!/usr/bin/env python3
"""Build the per-round sf10 delta table from two TimeOne sweep logs.

Usage: sweep_delta.py <baseline_log> <current_log> [threshold_ratio]

Both logs hold `qNN warm=W rounds=[...] min=M` lines. Baseline lines
with more than one round entry are dropped (those are the sf1 3-round
format that leaked into the r11 transcript capture). When a query
appears more than once in a log, the smallest min wins. Emits a
markdown table of every query present in either log with min times and
the ratio, flagging rows whose ratio moved more than threshold (default
1.3x either way), plus NEW/GONE markers.
"""
import re
import sys

LINE = re.compile(r"(q\S+) warm=([\d.]+) rounds=\[([^\]]*)\] min=([\d.]+)")


def load(path, single_round_only=False):
    out = {}
    for raw in open(path):
        m = LINE.match(raw.strip())
        if not m:
            continue
        if single_round_only and "," in m.group(3):
            continue
        name, mn = m.group(1), float(m.group(4))
        out[name] = min(out.get(name, mn), mn)
    return out


base = load(sys.argv[1], single_round_only=True)
cur = load(sys.argv[2])
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

names = sorted(set(base) | set(cur))
print("| Query | baseline min (s) | current min (s) | ratio | note |")
print("|---|---|---|---|---|")
flagged = []
for n in names:
    b, c = base.get(n), cur.get(n)
    if b is None:
        print(f"| {n} | — | {c:.2f} | — | NEW |")
    elif c is None:
        print(f"| {n} | {b:.2f} | — | — | GONE |")
    else:
        r = c / b
        note = ""
        if r > thresh:
            note = "**slower**"
            flagged.append((n, b, c, r))
        elif r < 1 / thresh:
            note = "faster"
        print(f"| {n} | {b:.2f} | {c:.2f} | {r:.2f}× | {note} |")

tot_b = sum(base[n] for n in names if n in base and n in cur)
tot_c = sum(cur[n] for n in names if n in base and n in cur)
print(f"\ncommon queries: {sum(1 for n in names if n in base and n in cur)}; "
      f"sum of mins {tot_b:.1f} → {tot_c:.1f} s ({tot_c / tot_b:.2f}×)")
if flagged:
    print("\nflagged slower (> %.1f×):" % thresh)
    for n, b, c, r in flagged:
        print(f"  {n}: {b:.2f} → {c:.2f} ({r:.2f}×)")
