"""Declared query registry — the t2 correctness contract (SURVEY.md §2c).

Every implemented operator registers here as a named query:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-side implementation,
  built from the engine's operator modules.
- ``oracle`` — equivalent DuckDB SQL over the same parquet fixtures, or
  ``None`` for genuinely non-SQL-expressible operators (the driver then
  records a weaker rows-only check).

Column names are part of the contract: the driver sorts columns by name
before value-hashing, so Spark aliases and oracle ``AS`` names must agree
exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator registering a (spark_fn, duckdb_oracle) pair."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY)."""
    from sparkflow_spark.queries import (  # noqa: F401
        relational,
        relational_ext,
        tpch_suite,
        functions_suite,
        textops,
        dedup_suite,
        similarity_suite,
        streaming_suite,
        multimodal_suite,
        ml_suite,
    )

    return REGISTRY
