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

import re
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
    # BNLJ nodes whose build side is NOT a provably-1-row global
    # aggregate (scalar attachment) — the ones that matter at scale
    n_unbounded_nested_loops: int
    n_exchanges: int
    n_broadcast_joins: int
    n_sort_merge_joins: int
    n_hash_aggregates: int
    has_partial_agg: bool
    n_python_stages: int
    pushed_filters: list[str] = field(default_factory=list)
    scan_schemas: list[str] = field(default_factory=list)
    # consumer node names sitting directly above an
    # ``Exchange SinglePartition`` — ["Sort"], ["Window"], ... A Sort or
    # Window here means the WHOLE input is serialized through one task;
    # a final HashAggregate here is fine (partials already reduced it).
    single_partition_consumers: list[str] = field(default_factory=list)

    def problems(
        self,
        *,
        forbid_cartesian: bool = True,
        forbid_nested_loop: bool = True,
        max_exchanges: int | None = None,
        max_python_stages: int | None = None,
        forbid_single_partition_sort: bool = False,
        require_partial_agg: bool = False,
        require_broadcast_join: bool = False,
        require_pushed_filter: str | None = None,
    ) -> list[str]:
        out: list[str] = []
        if forbid_cartesian and self.has_cartesian:
            out.append("CartesianProduct in plan — O(n*m) pair generation")
        if forbid_nested_loop and self.n_unbounded_nested_loops:
            out.append(
                f"{self.n_unbounded_nested_loops} BroadcastNestedLoopJoin(s) "
                "with an unbounded build side — no equi-key; per-row scans of "
                "the broadcast side and a driver OOM once neither side fits "
                "(scalar-broadcast BNLJs — 1-row global-aggregate build — are "
                "exempt by construction)"
            )
        if max_exchanges is not None and self.n_exchanges > max_exchanges:
            out.append(f"{self.n_exchanges} exchanges (> {max_exchanges} allowed)")
        if max_python_stages is not None and self.n_python_stages > max_python_stages:
            out.append(
                f"{self.n_python_stages} Python stages (> {max_python_stages}) — "
                "a self-join re-executing an Arrow subplan per side, or an "
                "accidental row-at-a-time UDF"
            )
        if forbid_single_partition_sort:
            hot = [
                c
                for c in self.single_partition_consumers
                if c in ("Sort", "Window", "WindowGroupLimit")
            ]
            if hot:
                out.append(
                    f"single-partition {'/'.join(hot)} — the entire input is "
                    "serialized through ONE task (a no-partition window or "
                    "global sort on unbounded rows)"
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


def _count_nodes(plan: str, *names: str) -> int:
    """Count physical nodes by their numbered detail-section headers.

    Formatted explain prints every node TWICE — once in the tree
    (``+- Exchange (4)``) and once as a detail header (``(4) Exchange``)
    — so naive ``plan.count("Exchange")`` double-counts, and a substring
    match also swallows ``BroadcastExchange``/``ReusedExchange``. The
    detail headers ``^(N) NodeName`` are unique per node and use the
    exact node name, so they are the reliable census. ``\\b`` after the
    name keeps ``Exchange`` from matching ``BroadcastExchange`` while
    still allowing codegen suffixes (``(5) HashAggregate [codegen id : 2]``).
    """
    total = 0
    for name in names:
        total += len(re.findall(r"^\(\d+\) " + re.escape(name) + r"\b", plan, re.M))
    return total


_TREE_LINE = re.compile(r"^(?P<pre>[\s:+*-]*)(?P<name>[A-Za-z]\S*).* \((?P<id>\d+)\)\s*$")


def _parse_tree(plan: str) -> list[tuple[int, str, str]]:
    """The indented tree section as (indent, node_name, node_id) in
    pre-order. Join qualifiers in tree lines
    (``BroadcastHashJoin Inner BuildRight (6)``) reduce to the node
    name's first token."""
    tree: list[tuple[int, str, str]] = []
    in_tree = False
    for line in plan.splitlines():
        if line.startswith("== Physical Plan =="):
            in_tree = True
            continue
        if in_tree:
            if not line.strip():
                break
            m = _TREE_LINE.match(line)
            if m:
                tree.append((len(m.group("pre")), m.group("name"), m.group("id")))
    return tree


def _detail_blocks(plan: str) -> dict[str, str]:
    """Detail-section text keyed by node id."""
    out: dict[str, str] = {}
    for block in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) ", block)
        if m:
            out.setdefault(m.group(1), block)
    return out


def _single_partition_consumers(plan: str) -> list[str]:
    """Node names directly consuming an ``Exchange SinglePartition``.

    Works from the formatted explain's two views: the detail blocks give
    which Exchange ids are SinglePartition; the indented tree gives each
    node's parent (nearest shallower line above).
    """
    sp_ids: set[str] = set()
    for nid, block in _detail_blocks(plan).items():
        if (
            block.startswith(f"({nid}) Exchange")
            and "Arguments: SinglePartition" in block
            # ENSURE_REQUIREMENTS = the PLANNER silently serialized the
            # input (a no-partition window, a global sort requirement).
            # An explicit repartition(1) (REPARTITION_BY_NUM) is the
            # caller's declared intent — visible in their own code and
            # governed by output-size conventions, not a silent hazard.
            and "ENSURE_REQUIREMENTS" in block
        ):
            sp_ids.add(nid)
    if not sp_ids:
        return []
    tree = _parse_tree(plan)
    consumers: list[str] = []
    for i, (indent, _name, nid) in enumerate(tree):
        if nid in sp_ids:
            for j in range(i - 1, -1, -1):
                if tree[j][0] < indent:
                    consumers.append(tree[j][1])
                    break
    return consumers


_PASS_THROUGH = {
    # row-count-preserving (or reducing) unary nodes a broadcast build
    # side routes through on its way down to the node that decides its
    # cardinality
    "BroadcastExchange",
    "Exchange",
    "AQEShuffleRead",
    "Project",
    "Filter",
    "Sort",
    "ColumnarToRow",
    "InputAdapter",
    "Coalesce",
    # scalar UDF evaluation adds columns, never rows
    "ArrowEvalPython",
    "BatchEvalPython",
}
_AGG_NODES = {"HashAggregate", "ObjectHashAggregate", "SortAggregate"}


def _unbounded_nested_loops(plan: str) -> int:
    """BroadcastNestedLoopJoin nodes whose build side is NOT provably
    one row.

    Two build-side shapes are provably bounded and exempt:

    - a keys-empty global aggregate (``Keys: []`` — exactly one output
      row): the canonical plan for attaching a scalar (a global avg, a
      count, a percentile cut) to every row;
    - a global limit (``GlobalLimit`` / ``TakeOrderedAndProject`` /
      ``CollectLimit``): a fixed-size panel (e.g. a 10-probe set)
      broadcast against the corpus — its size is a literal in the plan,
      independent of data scale.

    Every OTHER BNLJ re-scans an arbitrary broadcast side per row and
    dies when neither side fits — those are the ones a deploy-time
    guard must block. Classified by walking the build child's unary
    pass-through chain down to the first node that decides its
    cardinality."""
    tree = _parse_tree(plan)
    details = _detail_blocks(plan)
    unbounded = 0
    for i, (indent, name, nid) in enumerate(tree):
        if name != "BroadcastNestedLoopJoin":
            continue
        # span of the subtree, then its direct children (minimal indent)
        span = []
        for j in range(i + 1, len(tree)):
            if tree[j][0] <= indent:
                break
            span.append(j)
        if not span:
            unbounded += 1
            continue
        child_indent = min(tree[j][0] for j in span)
        children = [j for j in span if tree[j][0] == child_indent]
        build_right = "BuildLeft" not in details.get(nid, "")
        build = children[-1] if build_right else children[0]
        # walk the unary chain: in pre-order the first child is the next
        # node; pass-throughs preserve cardinality
        k = build
        while k < len(tree) and tree[k][1] in _PASS_THROUGH:
            k += 1
        if k < len(tree):
            node = tree[k][1]
            if node in _AGG_NODES and re.search(
                r"^Keys: \[\]", details.get(tree[k][2], ""), re.M
            ):
                continue  # global aggregate: exactly one row — bounded
            if node in ("GlobalLimit", "TakeOrderedAndProject", "CollectLimit"):
                continue  # fixed-size panel: bounded by the limit literal
        unbounded += 1
    return unbounded


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
    n_agg = _count_nodes(plan, "HashAggregate", "ObjectHashAggregate", "SortAggregate")
    # partial aggregation is visible in the detail blocks as
    # ``Functions [N]: [partial_sum(...)]`` — a direct marker, unlike the
    # old ">=2 HashAggregate nodes" heuristic which a single node's
    # doubled explain text satisfied vacuously. Keys-only aggregates
    # (DISTINCT / INTERSECT / dedup) print ``Functions: []`` in BOTH
    # phases, so their presence also counts: Catalyst always gives them
    # a map-side phase, and when it plans just one node the input was
    # already partitioned on the keys (skipping partial is optimal, not
    # a missing combine).
    has_partial = (
        re.search(r"^Functions \[\d+\]: \[partial_", plan, re.M) is not None
        or re.search(r"^Functions: \[\]", plan, re.M) is not None
    )
    return PlanReport(
        has_cartesian=_count_nodes(plan, "CartesianProduct") > 0,
        has_nested_loop=_count_nodes(plan, "BroadcastNestedLoopJoin") > 0,
        n_unbounded_nested_loops=_unbounded_nested_loops(plan),
        # shuffle exchanges only: BroadcastExchange is cheap-by-design and
        # ReusedExchange is a cache hit, so neither counts against a
        # max_exchanges budget.
        n_exchanges=_count_nodes(plan, "Exchange"),
        n_broadcast_joins=_count_nodes(plan, "BroadcastHashJoin"),
        n_sort_merge_joins=_count_nodes(plan, "SortMergeJoin"),
        n_hash_aggregates=n_agg,
        has_partial_agg=has_partial,
        n_python_stages=_count_nodes(
            plan,
            "ArrowEvalPython",
            "BatchEvalPython",
            "MapInPandas",
            "MapInArrow",
            "PythonMapInArrow",
            "FlatMapGroupsInPandas",
            "FlatMapCoGroupsInPandas",
            "FlatMapGroupsInPandasWithState",
        ),
        pushed_filters=pushed,
        scan_schemas=schemas,
        single_partition_consumers=_single_partition_consumers(plan),
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
