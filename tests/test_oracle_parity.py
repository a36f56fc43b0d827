"""The local mirror of the driver's t2 gate: every registered query with
an oracle must match DuckDB exactly at sf0.001 (fast inner loop).

``pytest tests/test_oracle_parity.py --sf-oracle`` style full sf0.01 runs
live in scripts/check_correctness.py.
"""

from __future__ import annotations

import pytest

from sparkflow_spark.oracle import compare, duckdb_connection
from sparkflow_spark.queries import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    res = compare(name, q.fn(spark, sf_dir), q.oracle, duck)
    assert res.match, f"{name}: {res.detail} (spark={res.spark_rows}, oracle={res.oracle_rows})"
    assert res.spark_rows >= 0
