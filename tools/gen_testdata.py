"""Deterministic synthetic test-table generator.

Produces the same TPC-H-ish star schema + ``events``/``documents``/
``embeddings`` tables as the driver-generated `/root/testdata/sf*` dirs
(schemas verified against them), so any checkout — CI runners included —
can materialize fixtures locally:

    python tools/gen_testdata.py --sf 0.001 --out /tmp/sf0.001

Values are seeded (numpy PCG64, seed=42) and therefore reproducible, but
NOT bit-identical to the driver's tables; every consumer in ``tests/``
compares Spark against a DuckDB oracle over the SAME files, so
self-consistency is the contract, not bit-parity.  No Spark dependency —
pure numpy + pyarrow, generates sf0.001 in well under a second.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = (
    "the a fast slow big small key value row column table scan filter join "
    "group agg sort merge hash window stream batch spark query data order "
    "line part customer vector"
).split()

LANGS = ["en", "de", "fr", "es", "zh"]
SEGMENTS = ["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
ORDER_STATUS = ["O", "F", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_ADJ = ["cold", "small", "large", "hot", "shiny", "dull", "red", "green"]
PART_NOUN = ["widget", "bolt", "gear", "spring", "valve", "pump"]
PART_TYPE = ["ECONOMY", "PROMO", "STANDARD", "DELUXE"]

BASE_ROWS = {  # rows at sf=0.001; scaled linearly except the fixed dims
    "region": 5,
    "nation": 25,
    "supplier": 10,
    "customer": 150,
    "part": 200,
    "orders": 1500,
    "lineitem": 6000,
    "events": 1000,
    "documents": 500,
    "embeddings": 500,
}
FIXED = {"region", "nation"}
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")
#: TPC-H-ish date origin: the driver's orders/lineitem dates span
#: 1995-2001 and several rel_* queries filter inside that range
#: (rel_agg_q1's 1998-09-02 cutoff, the tpch_q3/q5 shapes) — a 2024
#: origin made those queries EMPTY on generated data, which the
#: corpus-parity tests reject as vacuous.
EPOCH_1995 = np.datetime64("1995-01-01T00:00:00", "us")


def _n(table: str, sf: float) -> int:
    base = BASE_ROWS[table]
    return base if table in FIXED else max(1, int(round(base * sf / 0.001)))


def _text(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(rng.choice(WORDS, size=n_words))


def generate(sf: float, out_dir: str, seed: int = 42) -> dict[str, int]:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {}

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = table.num_rows

    n = _n("region", sf)
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(n), pa.int32()),
                "r_name": REGIONS[:n],
            }
        ),
    )

    n = _n("nation", sf)
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(n), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(n)],
                "n_regionkey": pa.array(rng.integers(0, 5, n), pa.int32()),
            }
        ),
    )

    n = _n("supplier", sf)
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n)],
                "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
                "s_acctbal": np.round(rng.uniform(-999, 9999, n), 2),
            }
        ),
    )

    n = _n("customer", sf)
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n)],
                "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
                "c_acctbal": np.round(rng.uniform(-999, 9999, n), 2),
                "c_mktsegment": rng.choice(SEGMENTS, n).tolist(),
            }
        ),
    )

    n = _n("part", sf)
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n), pa.int64()),
                "p_name": [
                    f"{rng.choice(PART_ADJ)} {rng.choice(PART_NOUN)}" for _ in range(n)
                ],
                "p_brand": [f"Brand#{int(k)}" for k in rng.integers(1, 25, n)],
                "p_type": rng.choice(PART_TYPE, n).tolist(),
                "p_size": pa.array(rng.integers(1, 50, n), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900, 2000, n), 2),
            }
        ),
    )

    n_cust = _n("customer", sf)
    n = _n("orders", sf)
    odate = EPOCH_1995 + rng.integers(0, 2400 * 24 * 3600, n) * np.timedelta64(1, "s")
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n), pa.int64()),
                "o_orderstatus": rng.choice(ORDER_STATUS, n).tolist(),
                "o_totalprice": np.round(rng.uniform(1000, 400000, n), 2),
                "o_orderdate": pa.array(odate),
                "o_orderpriority": rng.choice(PRIORITIES, n).tolist(),
            }
        ),
    )

    n_part, n_supp, n_ord = _n("part", sf), _n("supplier", sf), _n("orders", sf)
    n = _n("lineitem", sf)
    okey = np.sort(rng.integers(0, n_ord, n))
    sdate = EPOCH_1995 + rng.integers(0, 2500 * 24 * 3600, n) * np.timedelta64(1, "s")
    # per-order line numbers 1..k in arrival order
    linenumber = np.ones(n, dtype=np.int32)
    for i in range(1, n):
        if okey[i] == okey[i - 1]:
            linenumber[i] = linenumber[i - 1] + 1
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(okey, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n), pa.int64()),
                "l_linenumber": pa.array(linenumber, pa.int32()),
                "l_quantity": rng.integers(1, 51, n).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 100000, n), 2),
                "l_discount": np.round(rng.uniform(0, 0.1, n), 2),
                "l_tax": np.round(rng.uniform(0, 0.08, n), 2),
                "l_returnflag": rng.choice(["N", "A", "R"], n).tolist(),
                "l_linestatus": rng.choice(["O", "F"], n).tolist(),
                "l_shipdate": pa.array(sdate),
            }
        ),
    )

    n = _n("events", sf)
    ts = EPOCH_2024 + rng.integers(0, 30 * 24 * 3600 * 10**6, n) * np.timedelta64(1, "us")
    ts = np.sort(ts)
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts),
                # ~64 events/user (the driver's density): enough same-user
                # within-the-hour pairs that the attribution/interval-join
                # parity tests exercise real matches (n//10 users made the
                # stream-stream joins vacuously empty on generated data)
                "user_id": pa.array(rng.integers(0, max(2, n // 64), n), pa.int64()),
                "event_type": rng.choice(EVENT_TYPES, n).tolist(),
                "value": np.round(rng.uniform(0, 100, n), 3),
                "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)],
            }
        ),
    )

    n = _n("documents", sf)
    texts = []
    for i in range(n):
        if i and rng.random() < 0.05:  # near-dup of an earlier doc
            base = texts[int(rng.integers(0, i))].split()
            j = int(rng.integers(0, max(1, len(base))))
            base[j : j + 1] = [str(rng.choice(WORDS))]
            texts.append(" ".join(base))
        else:
            texts.append(_text(rng, int(rng.integers(20, 120))))
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": texts,
                "lang": rng.choice(LANGS, n).tolist(),
                "source": [f"src{int(k)}" for k in rng.integers(0, 20, n)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )

    n = _n("embeddings", sf)
    dim = 64
    emb = rng.normal(0, 1, (n, dim)).astype(np.float32)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array(rng.integers(0, 10, n), pa.int32()),
            }
        ),
    )
    return counts


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    counts = generate(args.sf, args.out, args.seed)
    print(json.dumps({"sf": args.sf, "out": args.out, "rows": counts}))


if __name__ == "__main__":
    main()
