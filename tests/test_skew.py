"""AQE skew-join guard: the engine's answer to hot keys at 100 TB is
(1) AQE's runtime skew split when it fires, (2) operators.salted_join
when it can't. The salted path has equivalence tests in
test_sources_operators; this pins the AQE path actually firing — and
documents the case where it DOESN'T (a downstream shuffle requirement,
e.g. an aggregation right above the join, suppresses the split unless
forceOptimizeSkewedJoin trades an extra shuffle — exactly the pattern
salted_join exists for)."""

from __future__ import annotations

import pyspark.sql.functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # toy-size the thresholds so the fixture-scale hot key qualifies
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.shuffle.partitions": "8",
}


def _skewed_join(spark):
    # 90% of the big side lands on key 0 — one shuffle partition would
    # carry ~180k rows vs ~2.5k for the rest
    big = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(97).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return big.join(small, "k")


def _with_confs(spark, fn):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        return fn()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark):
    """Plain join → sink: AQE must split the hot partition. The plan is
    read from the SAME DataFrame's QueryExecution after collect() —
    a .write/.first() spawns a fresh QueryExecution whose final
    adaptive plan is not reachable from the original df."""

    def run():
        joined = _skewed_join(spark)
        assert len(joined.collect()) == 200_000
        return joined._jdf.queryExecution().executedPlan().toString()

    plan = _with_confs(spark, run)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan[:1500]}"


def test_aqe_skew_suppressed_under_agg(spark):
    """The documented LIMIT of the AQE path: a hash aggregation above
    the join imposes a distribution requirement, and (with
    forceOptimizeSkewedJoin at its default false) AQE declines to split
    rather than add a shuffle — the hot key serializes through one
    task. This is the workload salted_join is for."""

    def run():
        agged = _skewed_join(spark).groupBy("k").agg(F.sum("payload").alias("s"))
        assert len(agged.collect()) == 97  # collect(): same QueryExecution
        return agged._jdf.queryExecution().executedPlan().toString()

    plan = _with_confs(spark, run)
    assert "isFinalPlan=true" in plan
    assert "skew=true" not in plan  # if Spark ever starts splitting here,
    # revisit the salted_join guidance in SCALE.md
