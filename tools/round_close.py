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

Writes ROUND_CLOSE.json: per-gate pass/fail + the key numbers, plus the
git HEAD the stamp was taken on. Exit 0 only when every gate that RAN
passed AND nothing was skipped; skipped gates are listed top-level and
demote the exit to 2 (stamped, but not a full close — all_pass stays
false, so a skipping run can never masquerade as a clean close).

`--verify-stamp` re-checks an existing ROUND_CLOSE.json against the
working tree: exits nonzero when the stamp's git HEAD is not the
current HEAD or src/ has uncommitted changes — the post-close-commit
skew that made one round stamp 477 while the final tree held 478.

Usage: python3 tools/round_close.py [--skip=sbt_test,sf1,...]
       python3 tools/round_close.py --verify-stamp
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def git_state():
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain", "--", "src"],
                           cwd=REPO, capture_output=True,
                           text=True).stdout.strip()
    return head, bool(dirty)


if "--verify-stamp" in sys.argv[1:]:
    with open(os.path.join(REPO, "ROUND_CLOSE.json")) as f:
        stamp = json.load(f)
    head, dirty = git_state()
    problems = []
    stamped = stamp.get("git_head")
    if stamped != head:
        # post-close commits are fine as long as they did not touch
        # src/ (artifact/doc commits are the normal round-close tail);
        # a src-touching commit is exactly the 477-vs-478 skew class
        touched = subprocess.run(
            ["git", "diff", "--name-only", f"{stamped}..{head}", "--",
             "src"], cwd=REPO, capture_output=True, text=True) \
            if stamped else None
        if touched is None or touched.returncode != 0:
            problems.append(f"stamp has no resolvable git_head "
                            f"({str(stamped)[:12]})")
        elif touched.stdout.strip():
            problems.append(
                f"commits {str(stamped)[:12]}..{head[:12]} touch src/: "
                + ",".join(touched.stdout.split()[:5]))
    if dirty:
        problems.append("src/ has uncommitted changes")
    if stamp.get("skipped"):
        problems.append(f"stamp skipped gates: {stamp['skipped']}")
    if not stamp.get("all_pass"):
        problems.append("stamp records all_pass=false — the close "
                        "itself did not pass")
    if problems:
        print("[close] STAMP STALE: " + "; ".join(problems) +
              " — re-run tools/round_close.py on the final tree")
        sys.exit(1)
    print(f"[close] stamp matches the tree ({head[:12]}), no gates skipped")
    sys.exit(0)

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
    # the gate asserts numbers READ FROM BENCH_delete.json — if the
    # deletion_bench gate was skipped this run, that artifact is from a
    # PREVIOUS tree and the post-takedown recall was never re-measured
    # on this one: refusing here is what keeps a skipping close from
    # silently re-asserting a stale measurement
    db = results.get("deletion_bench", {})
    if db.get("pass") is not True:
        state = "skipped" if db.get("skipped") else \
            ("FAILED" if db else "absent")
        raise RuntimeError(f"deletion_bench was {state} this run — "
                           "BENCH_delete.json is stale w.r.t. this tree; "
                           "run the deletion bench to completion (or skip "
                           "recall too, explicitly)")
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

head, dirty = git_state()
skipped = sorted(n for n, r in results.items() if r.get("skipped"))
failed = sorted(n for n, r in results.items() if r.get("pass") is False)
stamp = {"when_epoch_sec": int(time.time()),
         "git_head": head,
         "git_dirty_src": dirty,
         "gates": results,
         "skipped": skipped,
         # all_pass means a FULL clean close: every gate ran and
         # passed. Skipped gates are visible top-level and block it —
         # the docstring's 'exit 0 only when every gate passed' is now
         # true rather than aspirational.
         "all_pass": not failed and not skipped}
with open(os.path.join(REPO, "ROUND_CLOSE.json"), "w") as f:
    json.dump(stamp, f, indent=1)
print(f"[close] ROUND_CLOSE.json written; all_pass={stamp['all_pass']}"
      + (f"; skipped={','.join(skipped)}" if skipped else "")
      + (f"; FAILED={','.join(failed)}" if failed else ""))
sys.exit(1 if failed else (2 if skipped else 0))
