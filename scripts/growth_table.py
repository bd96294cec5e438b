#!/usr/bin/env python3
"""Growth table from ScaleBench JSON lines (r13 verdict item 1).

Usage: python3 scripts/growth_table.py <json_line_file>...

Each input file holds one JSON line printed by graft.tools.ScaleBench
(sf dir, per-line seconds, fixture row counts). Emits a markdown table
of seconds per scale factor plus the least-squares scaling exponent
alpha of t ~ sf^alpha over ln-ln points — alpha ≈ 1 is linear scaling,
alpha >= ~1.5 flags a superlinear family that needs a plan fix or a
documented density cause.
"""
import json
import math
import re
import sys


def main():
    runs = []
    for path in sys.argv[1:]:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    runs.append(json.loads(line))
    runs.sort(key=lambda r: r["rows"]["lineitem"])
    sfs = []
    for r in runs:
        m = re.search(r"sf([0-9.]+)$", r["sf"])
        sfs.append(float(m.group(1)) if m else r["rows"]["lineitem"] / 6e6)
    keys = [k for k in runs[0]["lines"]]
    hdr = " | ".join(f"sf{s:g}" for s in sfs)
    print(f"| line | {hdr} | alpha |")
    print("|---" * (len(sfs) + 2) + "|")
    for k in keys:
        ts = [r["lines"].get(k, -1.0) for r in runs]
        pts = [(math.log(s), math.log(t))
               for s, t in zip(sfs, ts) if t > 0]
        if len(pts) >= 2:
            n = len(pts)
            sx = sum(x for x, _ in pts)
            sy = sum(y for _, y in pts)
            sxx = sum(x * x for x, _ in pts)
            sxy = sum(x * y for x, y in pts)
            alpha = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            a = f"{alpha:.2f}"
        else:
            a = "-"
        cells = " | ".join(f"{t:.2f}" if t >= 0 else "FAIL" for t in ts)
        print(f"| {k} | {cells} | {a} |")
    rows = runs[-1]["rows"]
    print()
    print("Row counts at the largest run: " +
          ", ".join(f"{t}={n:,}" for t, n in sorted(rows.items())))


if __name__ == "__main__":
    main()
