#!/usr/bin/env python3
"""Per-query scaling report: ratio of two Bench JSON lines (e.g. sf1.0
vs sf0.1). Bounded queries (fixed doc_id subsets) are expected ~1x;
unbounded ones ~10x data → ratio near or below 10 (fixed per-query
overhead amortizes; super-10x flags a superlinear plan).

Usage: python3 tools/scaling_report.py BIG.json SMALL.json [data_ratio=10]

data_ratio is the big/small DATA multiple (10 for sf1.0 vs sf0.1, 30
for sf3.0 vs sf0.1): a per-query time ratio above it is superlinear.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    big, small = load(sys.argv[1]), load(sys.argv[2])
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qb, qs = big["queries"], small["queries"]
    rows = []
    for name in qb:
        if name in qs and qb[name] and qs[name]:
            rows.append((qb[name] / qs[name], qs[name], qb[name], name))
    rows.sort(reverse=True)
    print(f"{'ratio':>7} {'small_s':>8} {'big_s':>8}  query")
    for r, s, b, n in rows:
        flag = f"  <-- super-{data_ratio:g}x" if r > data_ratio else ""
        print(f"{r:7.2f} {s:8.2f} {b:8.2f}  {n}{flag}")
    shared = [n for n in qb if n in qs and qb[n] and qs[n]]
    tb = sum(qb[n] for n in shared)
    ts = sum(qs[n] for n in shared)
    print(f"\ntotals over {len(shared)} shared queries: "
          f"big={tb:.1f}s small={ts:.1f}s ratio={tb/ts:.2f}")


if __name__ == "__main__":
    main()
