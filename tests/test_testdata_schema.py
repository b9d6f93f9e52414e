"""Fail-fast probe of the driver-generated testdata schemas.

The driver regenerates /root/testdata every round; round 3 shipped
against a silent drift (events.ts flipped bigint-nanos -> timestamp[us])
that surfaced as 7 scattered test failures and a crashed bench run.
This module pins every column/dtype assumption the engine makes in ONE
place, so the next drift fails here with an explicit message instead.

Dtypes are asserted as *accepted sets*: where the engine probes the
loaded dtype at runtime (events.ts via ``streaming.events.event_time_col``)
every representation the probe handles is accepted; everywhere else the
single dtype the queries rely on is required.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: table -> {column: accepted arrow dtypes}.  A missing column or an
#: unexpected dtype is a drift the engine code must be taught about.
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32", "int64"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32", "int64"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32", "int64"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32", "int64"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32", "int64"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32", "int64"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32", "int64"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
    },
    "events": {
        "event_id": {"int64"},
        # every representation event_time_col/ts_micros_col handle
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32", "int64"},
    },
}


def _arrow_schema(table: str):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    if os.path.isfile(path):
        return pq.read_schema(path)
    # directory-style parquet (driver may shard larger SFs)
    parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if parts:
        return pq.read_schema(parts[0])
    pytest.fail(f"testdata table missing: {path}")


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_matches_engine_assumptions(table):
    schema = _arrow_schema(table)
    actual = {f.name: str(f.type) for f in schema}
    drifted = []
    for col, accepted in EXPECTED[table].items():
        if col not in actual:
            drifted.append(f"{table}.{col}: MISSING (have: {sorted(actual)})")
        elif actual[col] not in accepted:
            drifted.append(
                f"{table}.{col}: dtype drifted to {actual[col]!r} "
                f"(engine handles {sorted(accepted)})"
            )
    assert not drifted, (
        "driver testdata drifted from the engine's schema assumptions — "
        "teach the probing loaders about the new layout:\n  "
        + "\n  ".join(drifted)
    )


def test_events_ts_probe_covers_actual_dtype(spark):
    """The runtime dtype probe must classify the actual events.ts column
    into one of its two handled branches (timestamp vs bigint-nanos)."""
    from lightfusion_spark.corpus.util import table as load
    from lightfusion_spark.streaming.events import _ts_dtype

    ev = load(spark, SF_DIR, "events")
    dt = _ts_dtype(ev)
    assert dt.startswith("timestamp") or dt in {"bigint", "long"}, (
        f"events.ts loads as {dt!r}, which event_time_col/ts_micros_col "
        "do not handle — add a branch"
    )
