#!/usr/bin/env python3
"""Standing 100x-parity gate (sf1 = 100x the driver's sf0.01 gate SF).

The sf1.0 fixtures are LOCAL artifacts (fixtures/sf1.0, gitignored) and
are wiped between rounds; the overflow surfaces they guard — cents
sums, whole-bit surprisal, scaled-BIGINT BM25, the integer ANN
derivations — only grow with the query surface. This script makes the
re-proof one command: regenerate the fixtures if absent, then run the
full selfcheck loop (Verify + DuckDB oracle) at sf1. Commit the final
"N pass / 0 fail" line in COVERAGE.md each round.

Usage: python3 tools/sf1_gate.py [fixdir=fixtures/sf1.0]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "fixtures/sf1.0")

if not os.path.isfile(os.path.join(FIX, "documents.parquet")):
    print(f"[sf1_gate] fixtures absent, regenerating {FIX} (tools/gen_sf1.py)")
    subprocess.run([sys.executable, "tools/gen_sf1.py", FIX, "10"],
                   check=True, cwd=REPO)
subprocess.run([sys.executable, "tools/selfcheck.py", FIX, "/tmp/v_sf1"],
               check=True, cwd=REPO)
