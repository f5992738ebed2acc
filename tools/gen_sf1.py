#!/usr/bin/env python3
"""Generate sf1.0-shaped fixtures (10x sf0.1) for scale evidence.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md: read-only). The
100 TB claims rest on plan shape; this buys one empirical order of
magnitude on top by generating tables with the SAME schemas (including
timestamp[us] events and order/ship dates, the round-10 fixture
format) and closely matched distributions, measured off sf0.1:

  - customer/supplier/part/orders/lineitem: TPC-H-ish uniforms, 1..17
    Poisson-ish lines per order (mean 4), integer-valued quantities,
    penny-grid prices/discounts/taxes, day-granular dates over the same
    spans;
  - events: us timestamps over the same 30-day window, 10x users,
    value 2dp, props = {"k": 0..99};
  - documents: 10-100 words drawn from the observed 31-word vocabulary,
    lang skew ~(41,15,15,15,14)%, source src0..src19 uniform. CONTRACT:
    document text must never contain U+000B (vertical tab) — Java's \\s
    includes it but DuckDB/RE2's does not, so a \\x0b doc would tokenize
    differently on the two engines and flip oracle hash parity on the
    tokenizing queries (q102/q103 and friends). Space-joined vocabulary
    words satisfy this by construction;
  - embeddings: row-normalized gaussian float32[64] (the observed
    fixture is isotropic unit-norm), labels 0..9.

Tooling only (driver-side python, like the other tools/ scripts); the
library itself never runs python. Deterministic: numpy PCG64 seed 777.

Usage: python3 tools/gen_sf1.py [outdir=fixtures/sf1.0] [scale=10]
"""
import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "fixtures/sf1.0"
SCALE = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SRC = "/root/testdata/sf0.1"
rng = np.random.default_rng(777)

N_CUST = 15000 * SCALE
N_SUPP = 1000 * SCALE
N_PART = 20000 * SCALE
N_ORD = 150000 * SCALE
N_LINE_TARGET = 600000 * SCALE
N_EVT = 100000 * SCALE
N_DOC = 5000 * SCALE
N_EMB = 2000 * SCALE

DAY_US = 86400000000  # microseconds per day (fixtures emit timestamp[us])
ORD_LO, ORD_HI = 9131, 11536          # days since epoch: 1995-01-01..2001-08-01
SHIP_LO, SHIP_HI = 9132, 11631        # 1995-01-02..2001-11-04
EVT_LO_NS = 1704067200 * 10**9        # 2024-01-01
EVT_SPAN_NS = 30 * 86400 * 10**9 - 60 * 10**9

VOCAB = np.array("""a agg batch big column customer data dup fast filter group
hash join key line merge order part query row scan slow small sort spark
stream table the value vector window""".split())
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.412, 0.151, 0.149, 0.148, 0.140])
SEGMENTS = np.array(["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
ETYPES = np.array(["click", "error", "purchase", "signup", "view"])
PTYPES = np.array(["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"])
ADJ = np.array("blue hot small cold new large old red green heavy".split())
NOUN = np.array("ring rod bolt anvil widget plate gear wheel".split())


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def money(lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def ts_us_days(days):
    # timestamp[us] since the round-10 fixture regeneration (was [ms])
    return pa.array((days.astype("int64") * DAY_US),
                    type=pa.timestamp("us"))


def main():
    os.makedirs(OUT, exist_ok=True)
    for t in ("region", "nation"):  # fixed dimension tables: byte-identical
        shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
        print(f"{t}: copied")

    ck = np.arange(N_CUST, dtype="int64")
    write("customer", pa.table({
        "c_custkey": ck,
        "c_name": pa.array([f"Customer#{i:09d}" for i in ck]),
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST).astype("int32")),
        "c_acctbal": money(-1000, 10000, N_CUST),
        "c_mktsegment": pa.array(SEGMENTS[rng.integers(0, 5, N_CUST)]),
    }))

    sk = np.arange(N_SUPP, dtype="int64")
    write("supplier", pa.table({
        "s_suppkey": sk,
        "s_name": pa.array([f"Supplier#{i:09d}" for i in sk]),
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP).astype("int32")),
        "s_acctbal": money(-1000, 10000, N_SUPP),
    }))

    pk = np.arange(N_PART, dtype="int64")
    write("part", pa.table({
        "p_partkey": pk,
        "p_name": pa.array(np.char.add(np.char.add(
            ADJ[rng.integers(0, len(ADJ), N_PART)], " "),
            NOUN[rng.integers(0, len(NOUN), N_PART)])),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, N_PART)]),
        "p_type": pa.array(PTYPES[rng.integers(0, 6, N_PART)]),
        "p_size": pa.array(rng.integers(1, 51, N_PART).astype("int32")),
        "p_retailprice": money(900, 1000, N_PART),
    }))

    ok = np.arange(N_ORD, dtype="int64")
    write("orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, N_CUST, N_ORD).astype("int64"),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, N_ORD)]),
        "o_totalprice": money(1000, 500000, N_ORD),
        "o_orderdate": ts_us_days(rng.integers(ORD_LO, ORD_HI + 1, N_ORD)),
        "o_orderpriority": pa.array(PRIORITIES[rng.integers(0, 5, N_ORD)]),
    }))

    # lines per order: Poisson(3)+1 capped at 17 matches the observed
    # 1..17 histogram with mean ~4
    nlines = np.minimum(rng.poisson(3.0, N_ORD) + 1, 17)
    lok = np.repeat(ok, nlines)
    nl = len(lok)
    linenum = (np.arange(nl) - np.repeat(np.cumsum(nlines) - nlines, nlines) + 1)
    write("lineitem", pa.table({
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, N_PART, nl).astype("int64"),
        "l_suppkey": rng.integers(0, N_SUPP, nl).astype("int64"),
        "l_linenumber": linenum.astype("int32"),
        "l_quantity": rng.integers(1, 51, nl).astype("float64"),
        "l_extendedprice": money(900, 105000, nl),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, nl)]),
        "l_shipdate": ts_us_days(rng.integers(SHIP_LO, SHIP_HI + 1, nl)),
    }))
    print(f"  (lineitem target {N_LINE_TARGET}, got {nl})")

    ek = np.arange(N_EVT, dtype="int64")
    write("events", pa.table({
        "event_id": ek,
        # timestamp[us] since the round-10 fixture regeneration (was
        # [ns]); EventTime normalizes either at the scan boundary
        "ts": pa.array((EVT_LO_NS + rng.integers(0, EVT_SPAN_NS, N_EVT)) // 1000,
                       type=pa.timestamp("us")),
        "user_id": rng.integers(0, 1500 * SCALE, N_EVT).astype("int64"),
        "event_type": pa.array(ETYPES[rng.integers(0, 5, N_EVT)]),
        "value": money(0, 560, N_EVT),
        "props": pa.array([json.dumps({"k": int(k)}) for k in
                           rng.integers(0, 100, N_EVT)]),
    }))

    dk = np.arange(N_DOC, dtype="int64")
    lens = rng.integers(10, 101, N_DOC)
    words = VOCAB[rng.integers(0, len(VOCAB), int(lens.sum()))]
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(N_DOC)]
    write("documents", pa.table({
        "doc_id": dk,
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(LANGS, N_DOC, p=LANG_P)),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, N_DOC)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype="int64")),
    }))

    vk = np.arange(N_EMB, dtype="int64")
    V = rng.standard_normal((N_EMB, 64))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(V.astype("float32").ravel()), 64).cast(pa.list_(pa.float32()))
    write("embeddings", pa.table({
        "vec_id": vk,
        "embedding": emb,
        "label": pa.array(rng.integers(0, 10, N_EMB).astype("int32")),
    }))


if __name__ == "__main__":
    main()
