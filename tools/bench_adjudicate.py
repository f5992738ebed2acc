#!/usr/bin/env python3
"""In-round capture-divergence guard (the r17 ask #4): when the
driver's bench capture (BENCH_r{N}.json) and the committed same-tree
capture (BENCH_sf01_local.json) disagree by more than THRESHOLD on any
query, re-run JUST the disputed queries at higher iteration count and
commit the adjudication — so a real regression can't hide behind the
"shared box" explanation, and box noise can't masquerade as one.

Usage: python3 tools/bench_adjudicate.py BENCH_r18.json \
         [BENCH_sf01_local.json] [threshold=1.5] [iters=5]

Writes BENCH_ab_r{N}.json beside the inputs when a divergence trips;
prints a one-line verdict either way. Exit 0 = no divergence or every
disputed query re-ran within threshold of the committed number; exit 1
= a disputed query reproduced its driver-side (slower) timing, i.e. a
likely real regression.
"""
import json
import os
import re
import subprocess
import sys

driver_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r18.json"
committed_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf01_local.json"
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

with open(os.path.join(repo, driver_path)) as f:
    drv = json.load(f)
with open(os.path.join(repo, committed_path)) as f:
    com = json.load(f)
committed = {k: v for k, v in com["queries"].items() if v is not None}

# driver per-query numbers: prefer the parsed JSON; fall back to
# regex-scraping the raw capture tail (medians appear as "qNN_x":1.23).
# A plain bench artifact (top-level "queries", e.g. a BENCH_sf01_local
# snapshot from another marker) is accepted as-is, so the tool also
# serves tree-vs-tree adjudication, not just driver-vs-committed.
driver = {}
parsed = drv.get("parsed")
if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
    driver.update({k: v for k, v in parsed["queries"].items()
                   if isinstance(v, (int, float))})
if not driver and isinstance(drv.get("queries"), dict):
    driver.update({k: v for k, v in drv["queries"].items()
                   if isinstance(v, (int, float))})
for name, val in re.findall(r'"(q\d+[a-z0-9_]*)":([0-9]+\.[0-9]+)',
                            drv.get("tail", "")):
    driver.setdefault(name, float(val))

disputed = {}
for q, dv in driver.items():
    cv = committed.get(q)
    if cv and cv > 0 and dv > 0:
        ratio = dv / cv
        if ratio > threshold or ratio < 1 / threshold:
            disputed[q] = {"driver": dv, "committed": cv,
                           "ratio": round(ratio, 3)}

n_round = drv.get("n", 0)
out_path = os.path.join(repo, f"BENCH_ab_r{n_round}.json")
if not disputed:
    print(f"no divergence > {threshold}x across {len(driver)} "
          f"driver-visible queries — nothing to adjudicate")
    sys.exit(0)

names = ",".join(sorted(disputed))
print(f"disputed ({len(disputed)}): {names} — re-running {iters} iters each")
# the re-run's numbers come from the detail ARTIFACT, not stdout: the
# stdout summary caps its queries object at the 5 slowest, so a round
# with 6+ disputed queries would never find them all on a stdout line
detail_path = os.path.join(repo, f"bench_ab_rerun_r{n_round}.json.tmp")
env = {**os.environ,
       "SPARK_GRAFT_SF_DIR": com.get("sf", "/root/testdata/sf0.1"),
       "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32"),
       "SPARK_GRAFT_BENCH_ITERS": str(iters),
       "SPARK_GRAFT_BENCH_ONLY": names,
       "SPARK_GRAFT_BENCH_OUT": detail_path}
cp = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                    cwd=repo, capture_output=True, text=True, timeout=3600,
                    env=env)
rerun = None
try:
    with open(detail_path) as f:
        j = json.load(f)
    # every disputed query must be present AND numeric: an errored
    # query lands as null in the detail artifact, and accepting it
    # would crash the log-ratio below with a traceback instead of a
    # verdict (and worse, could read as a clean adjudication)
    if all(isinstance(j.get("queries", {}).get(q), (int, float))
           and j["queries"][q] > 0 for q in disputed):
        rerun = j["queries"]
    elif "queries" in j:
        bad = [q for q in disputed
               if not isinstance(j["queries"].get(q), (int, float))]
        print(f"re-run detail artifact has non-numeric/missing rows for: "
              f"{','.join(sorted(bad))} (errored queries?) — refusing")
except (OSError, json.JSONDecodeError):
    pass
finally:
    try:
        os.unlink(detail_path)
    except OSError:
        pass
if rerun is None:
    print(cp.stdout[-2000:])
    sys.exit("re-bench produced no parseable detail artifact")

verdicts = {}
regressions = []
for q, d in disputed.items():
    rv = rerun[q]
    # the rerun median sides with whichever capture it is closer to
    # (log-scale distance); a rerun siding with a SLOWER driver number
    # is a likely real regression, not box noise
    import math
    side = ("driver" if abs(math.log(rv / d["driver"]))
            < abs(math.log(rv / d["committed"])) else "committed")
    real = side == "driver" and d["driver"] > d["committed"]
    verdicts[q] = {**d, "rerun_median": rv, "sides_with": side,
                   "likely_regression": real}
    if real:
        regressions.append(q)

out = {"round": n_round, "threshold": threshold, "iters": iters,
       "driver_capture": driver_path, "committed_capture": committed_path,
       "verdicts": verdicts,
       "verdict": ("REGRESSION: " + ",".join(sorted(regressions))
                   if regressions else "box noise — reruns side with the "
                   "committed capture")}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {out_path}: {out['verdict']}")
sys.exit(1 if regressions else 0)
