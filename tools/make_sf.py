"""Generate an sfN-shaped copy of the driver's synthetic testdata for
LOCAL measurement only (bench_extra / frozen-bench spot runs at scales
the read-only /root/testdata does not ship).

The driver's tables (TESTDATA.md) are simple seeded uniforms; this
reproduces every marginal distribution measured from sf0.1:

  lineitem   6,000,000*sf   keys uniform over scaled ranges, qty 1..50,
                            price U[900,105000] 2dp, disc 0..0.10 step
                            .01, tax 0..0.08, N/R/A, F/O, shipdate
                            day-granular U[1995-01-01, 2001-11-04]
  orders     1,500,000*sf   status P/O/F, totalprice U[1000,500000],
                            orderdate U[1995-01-01, 2001-08-01],
                            5 priorities
  customer     150,000*sf   Customer#%09d, nation 0..24, acctbal
                            U[-1000,10000], 5 segments
  part         200,000*sf   "<adj> <noun>" over the 16-word pool,
                            Brand#1..25, 6 types, size 1..50,
                            retail U[900,1000]
  supplier      10,000*sf   Supplier#%09d, acctbal U[-1000,10000]
  events     1,000,000*sf   exp(26s) arrivals from 2024-01-01,
                            15,000*sf users, 5 types, exp(50) value,
                            props {"k": 0..99}
  documents     50,000*sf   10..100 words over the 31-word vocab,
                            ~0.32% planted exact dups, lang en-weighted,
                            20 sources
  embeddings    20,000*sf   64-dim unit-norm gaussian, label 0..9
  nation/region fixed 25/5

NOT the driver's bit-exact data (different seed stream) — distribution
-faithful only, for timing.  Never used by bench.py, oracle_sql, or
tests.

Usage: python tools/make_sf.py 1.0 /root/sfdata/sf1.0
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOC_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
PART_WORDS = (
    "anvil blue bolt cold gear gizmo hot large new old plate red ring rod "
    "small widget"
).split()
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_P = [0.41, 0.15, 0.15, 0.14, 0.15]


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet", compression="snappy")
    print(name, table.num_rows, flush=True)


def _day_ts(rng, n, lo="1995-01-01", hi="2001-11-04"):
    lo_d = np.datetime64(lo)
    days = int((np.datetime64(hi) - lo_d) / np.timedelta64(1, "D"))
    d = lo_d + rng.integers(0, days + 1, n).astype("timedelta64[D]")
    return d.astype("datetime64[us]")


def main() -> None:
    sf = float(sys.argv[1])
    out = Path(sys.argv[2])
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_user = int(15_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": np.arange(5, dtype=np.int64),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": np.arange(25, dtype=np.int64),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int64),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    adj = np.array(PART_WORDS)[rng.integers(0, 16, n_part)]
    noun = np.array(PART_WORDS)[rng.integers(0, 16, n_part)]
    _write(out, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[
            rng.integers(0, 25, n_part)],
        "p_type": np.array(P_TYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _day_ts(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))
    _write(out, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["N", "R", "A"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _day_ts(rng, n_li),
    }))
    dt = rng.exponential(26.0, n_ev)
    ts = (np.datetime64("2024-01-01T00:00:00")
          + (np.cumsum(dt) * 1e6).astype("timedelta64[us]"))
    _write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_user, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": np.array([f'{{"k": {k}}}' for k in range(100)])[
            rng.integers(0, 100, n_ev)],
    }))

    wc = rng.integers(10, 101, n_doc)
    vocab = np.array(DOC_VOCAB)
    texts = [" ".join(vocab[rng.integers(0, 31, c)]) for c in wc]
    for i in rng.choice(n_doc, max(1, int(0.0032 * n_doc)), replace=False):
        if i > 0:
            texts[i] = texts[int(rng.integers(0, i))]
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": np.array([f"src{i}" for i in range(20)])[
            rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))
    V = rng.standard_normal((n_emb, 64))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(V), type=pa.list_(pa.float64())),
        "label": rng.integers(0, 10, n_emb),
    }))
    (out / "_DONE").touch()


if __name__ == "__main__":
    main()
