"""Shared Spark session + sf-dir fixtures for the test suite."""

from __future__ import annotations

import os
import sys

import pytest

# repo root importable (tests run from anywhere)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkflow_spark.session import build_session  # noqa: E402

SF_SMOKE = os.environ.get("SPARKFLOW_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARKFLOW_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="sparkflow_spark_tests", master="local[4]")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return SF_ORACLE
