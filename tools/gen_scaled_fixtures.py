"""Generate fixture tables at an arbitrary scale factor (VERDICT r7
item 2: make the 100x posture empirical with a third scale point).

The driver's fixtures stop at sf0.1 and are read-only; the duckdb
``tpch`` extension cannot download in this container. This generator
re-implements the OBSERVED fixture law (profiled from
/root/testdata/sf{0.01,0.1} — row counts, key ranges, category mixes,
value ranges; see SCALING.md round 8) with a seeded RNG, so growth
ratios measured between two of ITS OWN outputs are apples-to-apples:

    rows(sf): customer 150k*sf, supplier 10k*sf, part 200k*sf,
    orders 1.5M*sf, lineitem ~4 lines/order (linenumber 1..7),
    events 1M*sf, documents 50k*sf, embeddings 2k*(sf/0.1)^(2/3.32)
    (driver law: 500@0.01 -> 2000@0.1, i.e. x4 per decade);
    region/nation fixed.

Usage::

    python tools/gen_scaled_fixtures.py --sf 1 --out /tmp/scaledata/sf1
    python tools/gen_scaled_fixtures.py --sf 0.1 --out /tmp/scaledata/sf0.1
    python tools/gen_scaled_fixtures.py --sf 1 --skew 1.1 --out /tmp/scaledata/sf1-skew

Deterministic for a given (sf, seed, skew). Writes one parquet per table.

``--skew ALPHA`` (VERDICT r8 item 2) replaces the uniform key draws
with a bounded Zipf(ALPHA) law on every hot-path key — the 100 TB
reality where domains/users/brands/tokens are power-law distributed,
which the driver's near-uniform fixtures never stress:

    o_custkey, l_partkey, l_suppkey (join/agg fan-in),
    events.user_id (sessionization/agg), part.p_brand (x38's
    quadratic blocking key), documents.source (domain cap), and the
    document TOKEN draws themselves (hot shingles for the
    x102/x110/x120 shingle-shuffle family).

Row counts, value ranges and dup rates are unchanged — only the key
DISTRIBUTIONS move, so uniform-vs-skew at the same sf isolates the
skew cost and small-vs-big within the skew law gives apples-to-apples
growth.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
P_TYPES = ["LARGE", "SMALL", "ECONOMY", "STANDARD", "PROMO", "MEDIUM"]
P_ADJ = ["large", "hot", "blue", "red", "green", "small", "dim", "shiny"]
P_NOUN = ["ring", "bolt", "washer", "gear", "cap", "rod", "pin", "nut"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000


def _ts_us(base: str, offset_us: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype("int64")
    return pa.array(
        (base_us + offset_us).astype("datetime64[us]"), type=pa.timestamp("us")
    )


def write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows", file=sys.stderr)


def _zipf_p(n_keys: int, alpha: float) -> np.ndarray:
    ranks = np.arange(1, n_keys + 1, dtype=np.float64)
    p = ranks**-alpha
    return p / p.sum()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--skew",
        type=float,
        default=0.0,
        help="Zipf alpha for hot-path keys (0 = uniform, the driver law)",
    )
    args = ap.parse_args()
    sf, out = args.sf, args.out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    def keys(n_keys: int, size: int) -> np.ndarray:
        """Key draws: uniform, or bounded Zipf(--skew) with key 0 hottest."""
        if not args.skew:
            return rng.integers(0, n_keys, size)
        return rng.choice(n_keys, size=size, p=_zipf_p(n_keys, args.skew))

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(2_000 * (sf / 0.1) ** 0.60206)  # x4 per x10 data
    n_user = int(15_000 * sf)

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))

    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{P_ADJ[a]} {P_NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": pa.array([f"Brand#{b + 1}" for b in keys(25, n_part)]),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + 0.1 * np.arange(n_part), 2),
    }))

    # orders: dates uniform over 1995-01-01 .. 2001-08-01 (2405 days)
    odate_day = rng.integers(0, 2405, n_ord)
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(keys(n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1_000, 400_000, n_ord), 2),
        "o_orderdate": _ts_us("1995-01-01", odate_day * DAY_US),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: 1..7 lines per order (mean 4), shipdate = orderdate + 1..95d
    lines = rng.integers(1, 8, n_ord)
    okey = np.repeat(np.arange(n_ord), lines)
    n_li = okey.size
    linenum = np.concatenate([np.arange(1, k + 1) for k in lines])
    li_ship_day = np.repeat(odate_day, lines) + rng.integers(1, 96, n_li)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(keys(n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(keys(n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us("1995-01-01", li_ship_day * DAY_US),
    }))

    # events: 30 days of Jan 2024, exponential(50) values, {"k": n} props
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": _ts_us("2024-01-01", rng.integers(0, 30 * DAY_US, n_evt)),
        "user_id": pa.array(keys(n_user, n_evt), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(np.minimum(rng.exponential(50.0, n_evt), 560.0), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]),
    }))

    # documents: word salad over the 31-word fixture vocabulary, doc
    # length ~ U[8,115] words (chars ~44..577, mean ~297). ~0.5% exact
    # duplicates and ~0.5% one-word near-duplicates of earlier docs so
    # dedup/near-dup queries keep non-trivial answers at every scale.
    vocab = np.array(VOCAB)
    doc_lens = rng.integers(8, 116, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        words = vocab[keys(len(vocab), doc_lens[i])]
        texts.append(" ".join(words))
    n_dup = max(1, n_doc // 200)
    for src, dst in zip(
        rng.integers(0, n_doc, n_dup), rng.integers(0, n_doc, n_dup)
    ):
        if src != dst:
            texts[dst] = texts[src]
    for src, dst in zip(
        rng.integers(0, n_doc, n_dup), rng.integers(0, n_doc, n_dup)
    ):
        if src != dst:
            w = texts[src].split(" ")
            w[rng.integers(0, len(w))] = VOCAB[rng.integers(0, len(VOCAB))]
            texts[dst] = " ".join(w)
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": pa.array([f"src{i}" for i in keys(20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-normalized 64-dim, weak label clusters
    # (own-centroid cosine ~0.08, matching the driver fixture).
    labels = rng.integers(0, 10, n_emb)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = rng.standard_normal((n_emb, 64)) / 8.0 + 0.08 * centers[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype("float32")], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
