"""Plan-audit utilities: the scale guards from tests/test_plans.py as a
LIBRARY, so a production pipeline can assert its physical plans at
deploy time instead of discovering a regression at 100 TB.

Why this exists: every scale property this repo argues from — filters
pushed to the scan, dimensions broadcast, no nested-loop/cartesian
joins, map-side partial aggregation, bounded Python stages — is a
property of the PHYSICAL plan, and physical plans drift silently (a
widened column, a lost hint, a stats change flipping a broadcast to a
sort-merge join). ``assert_scalable(df)`` is the one-line guard a
pipeline adds next to its unit tests; ``plan_report(df)`` is the
inspectable form for dashboards/CI diffs.

All string parsing runs on Spark's own formatted explain output —
stable enough for feature PRESENCE checks (the same signal
``.explain("formatted")`` gives a human), and the only interface that
works uniformly across join/agg/scan node types without private APIs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted explain string (same text as
    ``df.explain("formatted")``, returned instead of printed)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@dataclass
class PlanReport:
    """Feature-presence summary of one query's physical plan."""

    has_cartesian: bool
    has_nested_loop: bool
    n_exchanges: int
    n_broadcast_joins: int
    n_sort_merge_joins: int
    n_hash_aggregates: int
    has_partial_agg: bool
    n_python_stages: int
    pushed_filters: list[str] = field(default_factory=list)
    scan_schemas: list[str] = field(default_factory=list)

    def problems(
        self,
        *,
        forbid_cartesian: bool = True,
        forbid_nested_loop: bool = True,
        max_exchanges: int | None = None,
        max_python_stages: int | None = None,
        require_partial_agg: bool = False,
        require_broadcast_join: bool = False,
        require_pushed_filter: str | None = None,
    ) -> list[str]:
        out: list[str] = []
        if forbid_cartesian and self.has_cartesian:
            out.append("CartesianProduct in plan — O(n*m) pair generation")
        if forbid_nested_loop and self.has_nested_loop:
            out.append(
                "BroadcastNestedLoopJoin in plan — no equi-key; per-row scans "
                "of the broadcast side and a driver OOM once neither side fits"
            )
        if max_exchanges is not None and self.n_exchanges > max_exchanges:
            out.append(f"{self.n_exchanges} exchanges (> {max_exchanges} allowed)")
        if max_python_stages is not None and self.n_python_stages > max_python_stages:
            out.append(
                f"{self.n_python_stages} Python stages (> {max_python_stages}) — "
                "a self-join re-executing an Arrow subplan per side, or an "
                "accidental row-at-a-time UDF"
            )
        if require_partial_agg and self.n_hash_aggregates and not self.has_partial_agg:
            out.append("aggregation has no map-side partial phase before the exchange")
        if require_broadcast_join and self.n_broadcast_joins == 0:
            out.append("expected a broadcast join; none planned")
        if require_pushed_filter is not None and not any(
            require_pushed_filter in p for p in self.pushed_filters
        ):
            out.append(
                f"filter {require_pushed_filter!r} did not reach a scan's "
                f"PushedFilters (saw: {self.pushed_filters})"
            )
        return out


def plan_report(df: DataFrame) -> PlanReport:
    """Parse the formatted physical plan into a :class:`PlanReport`."""
    plan = formatted_plan(df)
    pushed = [
        line.split("PushedFilters:", 1)[1].strip()
        for line in plan.splitlines()
        if "PushedFilters:" in line
    ]
    schemas = [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]
    n_agg = plan.count("HashAggregate")
    # a partial/final pair shows as >=2 HashAggregates around an Exchange
    has_partial = n_agg >= 2 and "Exchange" in plan
    return PlanReport(
        has_cartesian="CartesianProduct" in plan,
        has_nested_loop="BroadcastNestedLoopJoin" in plan,
        n_exchanges=plan.count("Exchange"),
        n_broadcast_joins=plan.count("BroadcastHashJoin"),
        n_sort_merge_joins=plan.count("SortMergeJoin"),
        n_hash_aggregates=n_agg,
        has_partial_agg=has_partial,
        n_python_stages=plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        pushed_filters=pushed,
        scan_schemas=schemas,
    )


class PlanAssertionError(AssertionError):
    """A plan guard failed; the message lists every violated property."""


def assert_scalable(df: DataFrame, **rules) -> PlanReport:
    """Guard a DataFrame's physical plan; raises :class:`PlanAssertionError`
    naming every violated property, returns the report when clean.

    Default rules: no CartesianProduct, no BroadcastNestedLoopJoin —
    the two shapes that are fine on fixtures and fatal at scale. Pass
    the keyword rules of :meth:`PlanReport.problems` to tighten
    (``max_exchanges=``, ``require_partial_agg=True``,
    ``require_pushed_filter="GreaterThan(l_quantity"``, ...).
    """
    rep = plan_report(df)
    probs = rep.problems(**rules)
    if probs:
        raise PlanAssertionError(
            "plan guard failed:\n  - " + "\n  - ".join(probs)
        )
    return rep
