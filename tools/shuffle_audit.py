#!/usr/bin/env python3
"""Shuffle-traffic audit: run graft.ShuffleProbe over a query set and
collect one JSON artifact (SHUFFLE_sf01.json by default).

Wall-clock at small SF hides shuffle cost (everything fits in page
cache); bytes-through-the-exchange scale linearly with the corpus, so
this is the per-query number to watch for 100 TB regressions — a diff
in this file means an exchange payload changed, which `BENCH_*.json`
often cannot see.

Usage:
  python3 tools/shuffle_audit.py [sfDir=/root/testdata/sf0.1] \
      [out=SHUFFLE_sf01.json] [q1,q2,... (default: the Explain headline
      set minus streaming drains)]

Tooling only (driver-side python, like the other tools/ scripts).
"""
import json
import subprocess
import sys

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "SHUFFLE_sf01.json"

# Explain.headline minus the streaming drains (their returned frame is a
# checkpoint scan; shuffle inside the drain harness is measured by the
# streaming specs) — keep in sync with graft.Explain.headline.
DEFAULT = [
    "q01_pricing_summary", "q03_nation_revenue", "q15_bbox_parts",
    "q20_fingerprint_dedup", "q22_cosine_topk", "q23_minhash_pairs",
    "q50_asof_native", "q51_ivf_ann", "q52_salted_join", "q53_range_join",
    "q57_hll_distinct", "q63_jaccard_prefix", "q66_seq_pack",
    "q68_ann_int8", "q75_bucketed_join", "q76_temperature_mix",
    "q81_bloom_semi", "q83_curriculum_shards", "q89_bigram_surprisal",
    "q102_repetition_profile", "q103_budget_select", "q106_incr_neardup",
    "q107_ivf_batch",
    "q118_ivfpq", "q122_ivfpq_batch", "q123_corpus_prep",
    # the deletion tier (batch legs only — q128 is a streaming drain,
    # excluded like q64/q71/q72): the takedown path must exchange
    # O(|delete|) (tombstone ids + the bounded debt count), never
    # O(index)
    "q125_band_delete", "q126_ivf_delete", "q127_ivfpq_delete",
]
queries = sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT

results = {}
for q in queries:
    cmd = ["sbt", "-batch", f"runMain graft.ShuffleProbe {q} {SF_DIR}"]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         env={"SPARK_GRAFT_CPUS": "8", "PATH": "/usr/bin:/bin:/usr/local/bin"})
    line = [l for l in out.stdout.splitlines() if '"query"' in l]
    if not line:
        print(f"FAIL {q}: no probe line\n{out.stdout[-2000:]}", file=sys.stderr)
        sys.exit(1)
    rec = json.loads(line[-1].split("] ", 1)[-1])
    results[q] = {k: rec[k] for k in
                  ("shuffle_write_bytes", "shuffle_write_records",
                   "shuffle_read_bytes", "sec")}
    print(f"{q}: write={rec['shuffle_write_bytes']:,} "
          f"read={rec['shuffle_read_bytes']:,} sec={rec['sec']}")

with open(OUT, "w") as f:
    json.dump({"sf_dir": SF_DIR, "queries": results}, f, indent=1, sort_keys=True)
print(f"wrote {OUT}")
