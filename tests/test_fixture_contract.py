"""Fixture-schema drift tripwire.

Round 3 shipped red because the driver regenerated ``events.parquet`` with
``ts`` as parquet timestamp[µs] isAdjustedToUTC=false — which Spark 4.x
infers as TIMESTAMP_NTZ — and every ``withWatermark`` query then threw
``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` four layers deep. These tests make
the NEXT silent fixture regeneration fail loudly, with a message naming
the fix, instead of as an AnalysisException inside streaming internals.
"""

from __future__ import annotations

import pytest

from sparkflow_spark.catalog import TABLE_NAMES, load_table

# Column sets per FIXTURES.md §B — names only (types are pinned separately
# where they are load-bearing).
EXPECTED_COLUMNS: dict[str, set[str]] = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


def test_every_table_matches_fixtures_md(spark, sf_dir):
    assert set(EXPECTED_COLUMNS) == set(TABLE_NAMES)
    drift = {}
    for name in TABLE_NAMES:
        got = set(load_table(spark, sf_dir, name).columns)
        if got != EXPECTED_COLUMNS[name]:
            drift[name] = {
                "missing": sorted(EXPECTED_COLUMNS[name] - got),
                "unexpected": sorted(got - EXPECTED_COLUMNS[name]),
            }
    assert not drift, (
        f"fixture column drift vs FIXTURES.md: {drift} — the driver "
        "regenerated the testdata; update FIXTURES.md and audit every query "
        "touching the drifted columns"
    )


def test_events_ts_reads_as_ltz_timestamp(spark, sf_dir):
    """withWatermark requires TIMESTAMP (LTZ). If this fails, the events
    fixture's on-disk timestamp representation changed again — extend
    catalog.normalize_event_time (and check session.py's
    spark.sql.parquet.inferTimestampNTZ.enabled=false conf is applied)."""
    dtype = dict(load_table(spark, sf_dir, "events").dtypes)["ts"]
    assert dtype == "timestamp", (
        f"events.ts reads as {dtype!r}, not 'timestamp' — every "
        "withWatermark streaming query will throw "
        "EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. Fix: handle this arrival "
        "shape in sparkflow_spark/catalog.py:normalize_event_time and "
        "verify spark.sql.parquet.inferTimestampNTZ.enabled=false in "
        "sparkflow_spark/session.py:_RUNTIME_CONFS."
    )


def test_events_ts_normalized_even_without_session_conf(spark, sf_dir):
    """The defensive-cast path: a raw session that did NOT get our
    inferTimestampNTZ conf reads the file as NTZ; normalize_event_time
    must still deliver LTZ so externally built sessions work."""
    from sparkflow_spark.catalog import normalize_event_time, table_path

    raw = spark.newSession()  # fresh SQL conf, inherits static confs only
    raw.conf.set("spark.sql.session.timeZone", "UTC")
    raw.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    df = raw.read.parquet(table_path(sf_dir, "events"))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"  # precondition: drift shape
    fixed = normalize_event_time(df)
    assert dict(fixed.dtypes)["ts"] == "timestamp"
    # value-preserving under UTC: same wall-clock min as the engine's read
    engine_min = load_table(spark, sf_dir, "events").agg({"ts": "min"}).first()[0]
    raw_min = fixed.agg({"ts": "min"}).first()[0]
    assert engine_min == raw_min


@pytest.mark.parametrize(
    "name,col,expected",
    [
        ("orders", "o_orderdate", "timestamp"),
        ("lineitem", "l_shipdate", "timestamp"),
        ("embeddings", "embedding", "array<float>"),
    ],
)
def test_load_bearing_dtypes(spark, sf_dir, name, col, expected):
    assert dict(load_table(spark, sf_dir, name).dtypes)[col] == expected
