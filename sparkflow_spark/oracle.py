"""Local mirror of the driver's DuckDB differential check.

Lets us run the exact correctness gate (Spark result vs DuckDB oracle at
a given sf dir) before every commit: same tables, same order-insensitive
compare (sort columns by name, sort rows, compare values).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from sparkflow_spark.catalog import TABLE_NAMES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{table_path(sf_dir, name)}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by all columns' string form."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_value)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _canon_value(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "<NULL>"
    # STRICT canonicalization — exactly as unforgiving as the driver's.
    # Round 1 lesson (VERDICT.md "What's wrong" #2): collapsing Decimal to
    # float and rounding to 9 digits made this mirror *more lenient* than
    # the driver, masking 11 real hash mismatches. A Decimal must survive
    # verbatim ("244999.90" stays scale-2) and floats must keep full repr
    # so any cross-engine type/format drift fails HERE before it fails
    # in CORRECTNESS_r{N}.json.
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(float(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


@dataclass
class DiffResult:
    name: str
    match: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_query: str,
    con: duckdb.DuckDBPyConnection,
) -> DiffResult:
    s = _canon(spark_df.toPandas())
    o = _canon(con.execute(oracle_query).fetchdf())
    if len(s) != len(o):
        return DiffResult(name, False, len(s), len(o), "row count mismatch")
    if list(s.columns) != list(o.columns):
        return DiffResult(
            name, False, len(s), len(o), f"columns {list(s.columns)} vs {list(o.columns)}"
        )
    if len(s) == 0:
        return DiffResult(name, True, 0, 0)
    if not s.equals(o):
        neq = (s != o).any(axis=1)
        idx = list(s.index[neq][:3])
        sample = "; ".join(
            f"row{i}: spark={s.loc[i].to_dict()} oracle={o.loc[i].to_dict()}" for i in idx
        )
        return DiffResult(name, False, len(s), len(o), f"value mismatch: {sample}")
    return DiffResult(name, True, len(s), len(o))


def run_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[DiffResult]:
    from sparkflow_spark.queries import load_all

    registry = load_all()
    con = duckdb_connection(sf_dir)
    results = []
    for qname, q in registry.items():
        if names is not None and qname not in names:
            continue
        if q.oracle is None:
            continue
        try:
            results.append(compare(qname, q.fn(spark, sf_dir), q.oracle, con))
        except Exception as exc:  # pragma: no cover - debugging aid
            results.append(DiffResult(qname, False, -1, -1, f"error: {exc}"))
    return results
