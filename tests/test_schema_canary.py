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
# VERDICT r5 #5: the contract is the COMPLETE post-loader schema per
# table (ordered columns + dtypes), not a spot-checked subset — a new,
# dropped, renamed or re-typed column in ANY driver table fails here
# in seconds instead of in the driver sample.
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
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        # NTZ is the CONTRACT for the date columns (naive, matching
        # DuckDB's timestamp semantics — every date-predicate oracle is
        # proven against it); only events.ts is normalized to
        # session-TZ timestamp, because watermarks require it.
        "l_shipdate": "timestamp_ntz",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "region": {"r_regionkey": "int", "r_name": "string"},
}


@pytest.mark.parametrize("table", STAR_TABLES)
def test_loader_dtypes_on_real_testdata(spark, sf_dir, table):
    got = load_table(spark, sf_dir, table).dtypes
    want = list(EXPECTED_DTYPES[table].items())
    assert got == want, (
        f"{table}: loader produced {got!r}, engine contract requires "
        f"{want!r} — the testdata's physical encoding drifted or the "
        f"loader normalization regressed"
    )


def test_key_columns_nonnull_on_real_testdata(spark, sf_dir):
    """Operators assume join/dedup keys and document text are non-null
    (md5 fingerprints, shingling, split hashing all key on them); a
    drift that introduces nulls must fail loudly, not silently change
    dedup groups."""
    from pyspark.sql import functions as F

    checks = {
        "documents": ["doc_id", "text", "lang"],
        "embeddings": ["vec_id", "embedding"],
        "events": ["event_id", "ts", "user_id", "event_type"],
        "lineitem": ["l_orderkey", "l_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
    }
    for table, cols in checks.items():
        df = load_table(spark, sf_dir, table)
        row = df.agg(
            *[
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
                for c in cols
            ]
        ).collect()[0]
        bad = {c: row[c] for c in cols if row[c]}
        assert not bad, f"{table}: null keys appeared: {bad}"


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


def test_nanos_truncation_matches_duckdb_incl_pre_epoch(spark, tmp_path):
    """The int64-nanos loader path truncates ns -> us TOWARD ZERO
    (`div 1000`), and so does DuckDB's TIMESTAMP_NS -> TIMESTAMP
    cast — including pre-epoch values, where a floor division would
    land one microsecond lower and silently diverge every
    event-time oracle (review r7 suspected floor; this pins the
    verified truncation agreement on a real ns parquet)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from big_data_bowl_spark.sources.io import normalize_event_ts

    vals = [-1500, -1000, -999, -1, 0, 1, 999, 1000, 1500,
            1_700_000_000_123_456_789]
    p = tmp_path / "ns.parquet"
    pq.write_table(
        pa.table({"ts": pa.array(vals, pa.timestamp("ns"))}), str(p)
    )
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            "SELECT epoch_us(CAST(ts AS TIMESTAMP)) FROM "
            f"read_parquet('{p}') ORDER BY ts"
        ).fetchall()
    ]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    got = [
        r.us
        for r in normalize_event_ts(spark.read.parquet(str(p)))
        .select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .collect()
    ]
    assert got == sorted(want)
