"""Engine façade: session + catalog + SQL surface.

Thin by design (SURVEY.md §7 M0): the SQL surface is ``spark.sql`` —
Catalyst is the optimizer, not us. The value-add lives in the operator
modules (``operators``, ``dedup``, ``similarity``, ``text``, ``ml``,
``streaming``) and in the catalog's scan discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkflow_spark import catalog
from sparkflow_spark.session import build_session, ensure_runtime_configs


class Engine:
    """A registered set of tables plus a query surface.

    >>> eng = Engine.local().register("/root/testdata/sf0.001")
    >>> eng.sql("SELECT COUNT(*) AS c FROM lineitem").show()
    """

    def __init__(self, spark: SparkSession):
        self.spark = ensure_runtime_configs(spark)
        self.tables: dict[str, DataFrame] = {}

    @classmethod
    def local(cls, **kwargs) -> "Engine":
        return cls(build_session(**kwargs))

    def register(self, sf_dir: str) -> "Engine":
        self.tables = catalog.register_views(self.spark, sf_dir)
        return self

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)
