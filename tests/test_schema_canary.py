"""Testdata schema canary (VERDICT r4 #6).

Round 4's only root cause was silent schema drift: the driver's
events.parquet moved from TIMESTAMP(NANOS) to naive timestamp[us]
(TIMESTAMP_NTZ) and nothing noticed — the fixture-built pytest suite
stayed green while 7 real-data queries broke. This suite loads every
star table from the REAL testdata through the loader boundary and
asserts the post-loader dtypes the engine's operators rely on. If the
lake's physical encoding drifts again, this fails in seconds instead
of at the driver gate.

Skips (doesn't fail) when the testdata directory is absent, so the
suite still runs in checkouts without /root/testdata mounted.
"""

from __future__ import annotations

import os

import pytest

from big_data_bowl_spark.sources.io import STAR_TABLES, load_table

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")),
    reason="real testdata not mounted",
)

# The loader contract: what downstream operators may assume per table.
# `timestamp` (session-TZ TimestampType) is the REQUIRED post-loader
# type for events.ts whatever the parquet stores (int64 nanos,
# TIMESTAMP_NTZ, ...) — unix_micros/watermarks/as-of joins depend on it.
EXPECTED_DTYPES: dict[str, dict[str, str]] = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_returnflag": "string",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_totalprice": "double",
        "o_orderpriority": "string",
    },
    "customer": {"c_custkey": "bigint", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_size": "int"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int"},
    "region": {"r_regionkey": "int", "r_name": "string"},
}


@pytest.mark.parametrize("table", STAR_TABLES)
def test_loader_dtypes_on_real_testdata(spark, sf_dir, table):
    got = dict(load_table(spark, sf_dir, table).dtypes)
    for col, want in EXPECTED_DTYPES[table].items():
        assert got.get(col) == want, (
            f"{table}.{col}: loader produced {got.get(col)!r}, engine "
            f"contract requires {want!r} — the testdata's physical "
            f"encoding drifted or the loader normalization regressed"
        )


def test_events_ts_values_survive_normalization(spark, sf_dir):
    """The NTZ->TIMESTAMP cast must relabel, not shift: min/max micros
    through the loader equal the raw parquet's naive micros (session
    TZ is UTC)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    row = ev.select(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]

    tbl = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    col = tbl.column("ts")
    typ = str(col.type)
    import pyarrow.compute as pc

    raw_lo = pc.min(col).as_py()
    raw_hi = pc.max(col).as_py()
    if typ.startswith("timestamp"):
        import datetime as dt

        epoch = dt.datetime(1970, 1, 1)
        to_us = lambda v: int((v - epoch).total_seconds() * 1e6)  # noqa: E731
        raw_lo, raw_hi = to_us(raw_lo), to_us(raw_hi)
    elif typ == "int64":  # legacy nanos encoding
        raw_lo, raw_hi = raw_lo // 1000, raw_hi // 1000
    assert (row.lo, row.hi) == (raw_lo, raw_hi)
