"""Deterministic sf1-equivalent fixture generator (VERDICT r10 #3).

The driver testdata stops at sf0.1 (~600 K lineitem rows), so the scaling
sweep's 100 TB extrapolation argument rested on sf0.01 -> sf0.1 ratios.
This tool generates one more decade locally — the same ten-table star
schema, the same dtypes (verified against the sf0.1 parquet footers:
timestamp[us] ntz, INT32 vs INT64 widths, list<float32> embeddings), the
same value distributions (measured from sf0.1: Poisson(4) lines/order
incl. ~1.8% empty orders, Exp(mean 50) event values, 31-word document
vocabulary with a 41% 'en' skew, 10-cluster unit-norm embeddings), at 10x
the sf0.1 row counts — then `tools/scaling_sweep.py` adds the sf0.1->sf1
point via SPARK_GRAFT_SF1_DIR.

Seed 42, single numpy default_rng stream, one parquet file per table:
byte-deterministic across runs. Writes OUTSIDE the read-only testdata
root (default /root/repo/.localdata/sf1, gitignored).

Usage: python tools/gen_sf1.py [out_dir] [--scale N]   (N x sf0.1; default 10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# sf0.1 row counts; sf1 = SCALE x these
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

_US = "us"  # every fixture timestamp is microsecond TIMESTAMP_NTZ
_DAY_US = 86_400_000_000


def _ts_us(iso: str) -> int:
    import datetime as dt

    d = dt.datetime.fromisoformat(iso)
    return int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}", file=sys.stderr)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/root/repo/.localdata/sf1"
    scale = 10
    if "--scale" in sys.argv:
        scale = int(sys.argv[sys.argv.index("--scale") + 1])
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    # --- fixed dimensions (identical content to every driver SF) ---
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = BASE["customer"] * scale
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": pa.array(
            [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)]),
    }))

    n_supp = BASE["supplier"] * scale
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, n_supp), 2)),
    }))

    n_part = BASE["part"] * scale
    names = [f"{a} {n}" for a in P_ADJ for n in P_NOUN]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([names[i] for i in rng.integers(0, 64, n_part)]),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array([P_TYPES[i] for i in rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        # sf0.1 pattern: retailprice = 900 + (partkey % 1000)/10
        "p_retailprice": pa.array(
            np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 2)),
    }))

    # --- orders + lineitem (referentially intact) ---
    n_ord = BASE["orders"] * scale
    date_lo, date_hi = _ts_us("1995-01-01"), _ts_us("2001-08-01")
    n_days = (date_hi - date_lo) // _DAY_US
    o_dates = date_lo + rng.integers(0, n_days + 1, n_ord) * _DAY_US
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": pa.array(
            [("O", "P", "F")[i] for i in rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500000, n_ord), 2)),
        "o_orderdate": pa.array(o_dates, pa.timestamp(_US)),
        "o_orderpriority": pa.array(
            [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)]),
    }))

    # lines per order: Poisson(4) — measured at sf0.1: avg 4.08 over
    # non-empty orders, ~1.8% empty orders, max 17
    nlines = rng.poisson(4.0, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), nlines)
    n_li = len(l_orderkey)
    linenumber = (
        np.arange(n_li, dtype=np.int64)
        - np.repeat(np.concatenate(([0], np.cumsum(nlines)[:-1])), nlines)
        + 1
    ).astype(np.int32)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(linenumber),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(
            np.round(qty * rng.uniform(900, 2100, n_li), 2)),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, n_li) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
        "l_returnflag": pa.array(
            [("R", "N", "A")[i] for i in rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            [("O", "F")[i] for i in rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            np.repeat(o_dates, nlines)
            + rng.integers(1, 96, n_li) * _DAY_US,
            pa.timestamp(_US)),
    }))

    # --- events: 30 days, ts-sorted, Exp(50) values ---
    n_ev = BASE["events"] * scale
    ev_lo, ev_hi = _ts_us("2024-01-01"), _ts_us("2024-01-31")
    ts = np.sort(rng.integers(ev_lo, ev_hi, n_ev))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp(_US)),
        "user_id": pa.array(rng.integers(0, 1500 * scale, n_ev)),
        "event_type": pa.array(
            [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.exponential(50.0, n_ev), 2)),
        "props": pa.array(
            ['{"k": %d}' % k for k in rng.integers(0, 100, n_ev)]),
    }))

    # --- documents: 31-word vocab, 10-100 words, planted exact dups ---
    n_doc = BASE["documents"] * scale
    lens = rng.integers(10, 101, n_doc)
    word_idx = rng.integers(0, len(VOCAB), int(lens.sum()))
    texts: list[str] = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(VOCAB[i] for i in word_idx[pos:pos + ln]))
        pos += ln
    # exact-duplicate rate measured at sf0.1: 8/5000 — plant 1 per 625
    for i in range(625, n_doc, 625):
        texts[i] = texts[i - 1]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(
            [LANGS[i] for i in rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array(
            [f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # --- embeddings: 10 clusters, unit-norm float32, dim 64 ---
    n_emb = BASE["embeddings"] * scale
    dim = 64
    centers = rng.standard_normal((10, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, 10, n_emb).astype(np.int32)
    raw = centers[label] * 2.0 + rng.standard_normal((n_emb, dim))
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    vecs = raw.astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(label),
    }))
    print(f"sf{scale/10:g}-equivalent fixture complete: {out_dir}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
