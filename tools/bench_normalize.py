#!/usr/bin/env python3
"""Calibration-normalized round-over-round bench comparison (the r19
verdict ask #7): every graft.Bench artifact since r19 embeds a
calibration pair — a pure-CPU kernel and a pure-shuffle kernel whose
cost is independent of the library code — so two captures taken on
different box conditions can be compared WITHOUT a same-box A/B: the
calibration ratio estimates how much of a query's drift is the box,
and the residual (normalized ratio) is attributable to the tree.

Usage: python3 tools/bench_normalize.py OLD.json NEW.json \
         [--threshold=1.5] [--out=BENCH_norm_rX_rY.json]

Accepts both artifact shapes: a driver capture (top-level `parsed` +
`tail`) or a plain graft.Bench detail artifact (top-level `queries`).
Queries are taken from `parsed.queries` / `queries`, then the raw
`tail` regex as fallback — same extraction as bench_adjudicate.py.

Writes one JSON artifact: per-query old/new/raw/normalized ratios,
the calibration factor, and the movers whose NORMALIZED ratio exceeds
the threshold in either direction. Exit 0 = no normalized mover;
exit 1 = at least one (adjudicate those with bench_adjudicate.py).
Exit 3 = calibration missing from either side (raw ratios only are
reported, nothing auto-flagged — an uncalibrated flag would just
re-litigate box noise).
"""
import json
import math
import os
import re
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
args = [a for a in sys.argv[1:] if not a.startswith("--")]
if len(args) < 2:
    sys.exit(__doc__)
old_path, new_path = args[0], args[1]
threshold = 1.5
out_path = None
for a in sys.argv[1:]:
    if a.startswith("--threshold="):
        threshold = float(a.split("=", 1)[1])
    elif a.startswith("--out="):
        out_path = a.split("=", 1)[1]
if out_path is None:
    def tag(p):
        m = re.search(r"r(\d+)", os.path.basename(p))
        return f"r{m.group(1)}" if m else \
            os.path.basename(p).replace(".json", "")
    out_path = f"BENCH_norm_{tag(old_path)}_{tag(new_path)}.json"


def load(path):
    with open(os.path.join(repo, path)) as f:
        j = json.load(f)
    src = j.get("parsed") if isinstance(j.get("parsed"), dict) else j
    queries = {k: v for k, v in (src.get("queries") or {}).items()
               if isinstance(v, (int, float)) and v > 0}
    for name, val in re.findall(r'"(q\d+[a-z0-9_]*)":([0-9]+\.[0-9]+)',
                                j.get("tail", "")):
        queries.setdefault(name, float(val))
    calib = src.get("calibration")
    if not (isinstance(calib, dict) and calib.get("cpu")
            and calib.get("shuffle")):
        calib = None
    return queries, calib


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


old_q, old_c = load(old_path)
new_q, new_c = load(new_path)
shared = sorted(set(old_q) & set(new_q))
if not shared:
    sys.exit(f"no shared queries between {old_path} and {new_path}")

factor = None
if old_c and new_c:
    cpu = median(new_c["cpu"]) / median(old_c["cpu"])
    shf = median(new_c["shuffle"]) / median(old_c["shuffle"])
    # geometric mean of the two kernels: queries are a mix of CPU- and
    # shuffle-bound work, and the geomean is symmetric in that mix
    factor = math.sqrt(cpu * shf)

rows = {}
movers = []
for q in shared:
    raw = new_q[q] / old_q[q]
    row = {"old": old_q[q], "new": new_q[q], "raw_ratio": round(raw, 3)}
    if factor:
        norm = raw / factor
        row["norm_ratio"] = round(norm, 3)
        if norm > threshold or norm < 1 / threshold:
            movers.append(q)
    rows[q] = row

out = {"old": old_path, "new": new_path, "n_shared": len(shared),
       "calibration_factor": round(factor, 4) if factor else None,
       "calibration": {"old": old_c, "new": new_c},
       "threshold": threshold,
       "median_raw_ratio": round(
           median([r["raw_ratio"] for r in rows.values()]), 3),
       "median_norm_ratio": round(median(
           [r["norm_ratio"] for r in rows.values()]), 3) if factor else None,
       "movers": sorted(movers),
       "queries": rows,
       "verdict": (f"NORMALIZED MOVERS >{threshold}x: "
                   + ",".join(sorted(movers)) if movers
                   else ("no normalized mover — drift is box-shaped"
                         if factor else
                         "UNCALIBRATED — raw ratios only, nothing flagged"))}
with open(os.path.join(repo, out_path), "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {out_path}: {out['verdict']} "
      f"(factor={out['calibration_factor']}, "
      f"median_norm={out['median_norm_ratio']}, n={len(shared)})")
sys.exit(3 if factor is None else (1 if movers else 0))
