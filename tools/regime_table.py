#!/usr/bin/env python3
"""Render the per-row join-regime table (verdict r11 ask #7) from a
merged SCALE artifact: for every decade/store row, the AQE-final join
regime on each side (bhj/smj counts) and whether the row's ratio spans
a broadcast->shuffle plan transition (bhj count drops while smj count
rises between the small and big sides).

Usage: python3 tools/regime_table.py SCALE_r12.json
Prints a markdown table (for PLANS.md) to stdout.
"""
import json, sys

doc = json.load(open(sys.argv[1]))
rows = []
for name in sorted(doc["queries"]):
    q = doc["queries"][name]
    if "small_bhj" not in q:
        continue  # skew rows carry occupancy fields, not join regimes
    sb, ss, bb, bs = (q["small_bhj"], q["small_smj"],
                      q["big_bhj"], q["big_smj"])
    crossing = "yes" if (bb < sb and bs > ss) else ""
    rows.append((name, f"{sb}b/{ss}s", f"{bb}b/{bs}s", crossing,
                 q.get("bytes_ratio"), q.get("linear")))
print("| row | small regime | big regime | bhj->smj crossing | bytes x | linear |")
print("|---|---|---|---|---|---|")
for n, s, b, c, r, lin in rows:
    print(f"| {n} | {s} | {b} | {c} | {r} | {lin} |")
crossings = [n for n, s, b, c, r, lin in rows if c]
print(f"\ncrossings: {len(crossings)} of {len(rows)} rows: "
      + ", ".join(crossings), file=sys.stderr)
