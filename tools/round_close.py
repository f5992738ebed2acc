#!/usr/bin/env python3
"""Automated round-close runner (the r18 verdict ask #5): one command
that re-proves every standing gate on the final tree and stamps the
results, so no gate — in particular the post-takedown recall point —
can silently go unexercised in a round.

Sequence (each gate independent; failures recorded, run continues):
  1. sbt test                      — the full ScalaTest suite
  2. selfcheck @ sf0.01            — 128-query DuckDB-oracle parity
  3. sf1 gate                      — 100x-parity selfcheck (fixtures
                                     regenerated if absent)
  4. DeletionBench @ largest fixture → BENCH_delete.json — refreshes
     the POST-TAKEDOWN recall measurement every round
  5. recall_gate                   — asserts BOTH operating points
     (intact ≥ 0.95 AND post-takedown ≥ 0.95) from the fresh artifact
  6. bench @ sf0.1                 — refreshes BENCH_sf01_local.json
     (with the calibration pair graft.Bench embeds)

Writes ROUND_CLOSE.json: per-gate pass/fail + the key numbers.
Exit 0 only when every gate passed.

Usage: python3 tools/round_close.py [--skip=sbt_test,sf1,...]
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKIP = set()
for a in sys.argv[1:]:
    if a.startswith("--skip="):
        SKIP = set(a.split("=", 1)[1].split(","))

results = {}


def gate(name, fn):
    if name in SKIP:
        results[name] = {"pass": None, "skipped": True}
        print(f"[close] {name}: SKIPPED")
        return
    t0 = time.time()
    try:
        extra = fn() or {}
        results[name] = {"pass": True, "sec": round(time.time() - t0, 1),
                         **extra}
        print(f"[close] {name}: PASS ({results[name]['sec']}s)")
    except Exception as e:  # noqa: BLE001 — a gate failure is data here
        results[name] = {"pass": False, "sec": round(time.time() - t0, 1),
                         "error": str(e)[:500]}
        print(f"[close] {name}: FAIL — {e}")


def run(cmd, timeout=7200, env=None):
    cp = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                        timeout=timeout,
                        env={**os.environ, **(env or {})})
    if cp.returncode != 0:
        tail = (cp.stdout + cp.stderr)[-1500:]
        raise RuntimeError(f"{' '.join(cmd)} -> {cp.returncode}: {tail}")
    return cp.stdout


def sbt_test():
    out = run(["sbt", "-batch", "test"], timeout=7200)
    m = re.search(r"Tests: succeeded (\d+), failed (\d+)", out)
    if not m or int(m.group(2)) != 0:
        raise RuntimeError(f"test summary: {m.group(0) if m else 'absent'}")
    return {"tests": int(m.group(1))}


def selfcheck():
    out = run([sys.executable, "tools/selfcheck.py",
               "/root/testdata/sf0.01", "/tmp/v_close"], timeout=7200)
    m = re.search(r"(\d+) pass / (\d+) fail", out)
    if not m or int(m.group(2)) != 0:
        raise RuntimeError(f"selfcheck: {m.group(0) if m else out[-300:]}")
    return {"queries": int(m.group(1))}


def sf1():
    out = run([sys.executable, "tools/sf1_gate.py"], timeout=10800)
    m = list(re.finditer(r"(\d+) pass / (\d+) fail", out))
    if not m or int(m[-1].group(2)) != 0:
        raise RuntimeError(f"sf1 gate: {m[-1].group(0) if m else out[-300:]}")
    return {"queries": int(m[-1].group(1))}


def largest_fixture():
    for c in ["/tmp/sf10", "/tmp/sf3", os.path.join(REPO, "fixtures/sf1.0"),
              "/root/testdata/sf0.1"]:
        if os.path.isfile(os.path.join(c, "embeddings.parquet")):
            return c
    return "/root/testdata/sf0.1"


def deletion_bench():
    sfd = largest_fixture()
    out = run(["sbt", "-batch", f"runMain graft.tools.DeletionBench {sfd}"],
              timeout=7200, env={"SPARK_GRAFT_CPUS": "16"})
    line = None
    for ln in out.splitlines():
        ln = re.sub(r"^\[info\]\s*", "", ln.strip())
        if ln.startswith('{"sf_dir"') or ln.startswith('{"'):
            try:
                j = json.loads(ln)
                if "pq_recall_after_purge" in j:
                    line = ln
            except json.JSONDecodeError:
                pass
    if line is None:
        raise RuntimeError("DeletionBench emitted no JSON line with "
                           "pq_recall_after_purge")
    with open(os.path.join(REPO, "BENCH_delete.json"), "w") as f:
        f.write(line + "\n")
    j = json.loads(line)
    return {"sf_dir": sfd,
            "pq_recall_after_purge": j["pq_recall_after_purge"]}


def recall():
    out = run([sys.executable, "tools/recall_gate.py"], timeout=7200)
    with open(os.path.join(REPO, "RECALL_GATE.json")) as f:
        g = json.load(f)
    pt = g.get("post_takedown")
    if pt is None:
        raise RuntimeError("RECALL_GATE.json has no post_takedown row — "
                           "DeletionBench gate must run first")
    if not (g["pass"] and pt["pass"]):
        raise RuntimeError(f"recall gate: intact={g['rerank_recall_at_10']} "
                           f"post_takedown={pt['rerank_recall_at_10']}")
    return {"intact": g["rerank_recall_at_10"],
            "post_takedown": pt["rerank_recall_at_10"]}


def bench():
    run(["sbt", "-batch", "runMain graft.Bench"], timeout=7200,
        env={"SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
             "SPARK_GRAFT_CPUS": "32"})
    with open(os.path.join(REPO, "BENCH_sf01_local.json")) as f:
        b = json.load(f)
    if b.get("error_count", 1) != 0:
        raise RuntimeError(f"bench errors: {b.get('errors')}")
    return {"total_sec": round(b["value"], 2),
            "n_queries": len(b["queries"]),
            "calibration": b.get("calibration")}


gate("sbt_test", sbt_test)
gate("selfcheck_sf001", selfcheck)
gate("sf1", sf1)
gate("deletion_bench", deletion_bench)
gate("recall", recall)
gate("bench_sf01", bench)

stamp = {"when_epoch_sec": int(time.time()),
         "gates": results,
         "all_pass": all(r.get("pass") in (True, None) for r in
                         results.values())}
with open(os.path.join(REPO, "ROUND_CLOSE.json"), "w") as f:
    json.dump(stamp, f, indent=1)
print(f"[close] ROUND_CLOSE.json written; all_pass={stamp['all_pass']}")
sys.exit(0 if stamp["all_pass"] else 1)
