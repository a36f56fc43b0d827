"""Physical-plan regression guards: the scale properties documented in
SCALE.md must stay true as queries evolve — pushdown reaching the scan,
broadcast hints taking effect, partial aggregation, window group limits,
global top-k without a global sort."""

from __future__ import annotations

import pytest

from sparkflow_spark.queries import load_all

REGISTRY = load_all()


def plan_of(spark, sf_dir, name) -> str:
    # Bypass the registry's result memo: these guards inspect how a
    # FRESH plan compiles under the CURRENT session confs — a memoized
    # DataFrame whose adaptive plan already finalized under different
    # confs (e.g. broadcast enabled) would make conf-tweaking guards
    # assert against the stale physical plan.
    from sparkflow_spark.queries import clear_result_memo

    clear_result_memo()
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q02_filter_and")
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "GreaterThan(l_quantity" in pushed and "LessThan(l_discount" in pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_scan_project")
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "r_regionkey" in read and "r_name" in read
    # nothing else from the table
    assert read.count(":") <= 3  # struct<r_regionkey:int,r_name:string>


def test_dimension_join_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q05_broadcast_inner_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_agg_is_partial_then_final(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q13_hash_agg_tpch_q1")
    # two HashAggregates split by an Exchange = map-side combine
    assert plan.count("HashAggregate") >= 2
    agg_positions = [i for i in range(len(plan)) if plan.startswith("HashAggregate", i)]
    exch = plan.find("Exchange")
    assert exch != -1


def test_window_topk_prunes_before_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q19_window_topk_per_group")
    # WindowGroupLimit below AND above the exchange (partial top-k)
    assert plan.count("WindowGroupLimit") >= 2


def test_global_topk_avoids_full_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q22_topk_global")
    assert "TakeOrderedAndProject" in plan


def test_semi_join_for_in_subquery(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q09_left_semi_join")
    assert "LeftSemi" in plan


def test_no_cartesian_in_theta_join(spark, sf_dir):
    """q11's equi component must be the join key (no BNLJ/cartesian)."""
    plan = plan_of(spark, sf_dir, "q11_theta_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or "BuildRight" in plan

def test_ann_near_dup_has_no_cartesian(spark, sf_dir):
    """The ANN embedding near-dup path must stay linear: bucket
    equi-joins + per-candidate verification — never the O(n^2)
    crossJoin of the brute-force oracle path."""
    plan = plan_of(spark, sf_dir, "d_embedding_near_dup_ann")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_clean_corpus_uses_semi_join_dedup(spark, sf_dir):
    """p_clean_corpus: dedup winners come back via a semi join (payload
    crosses the network once), and the quality filters stay in the scan
    stage (no extra shuffle before the dedup agg)."""
    plan = plan_of(spark, sf_dir, "p_clean_corpus")
    assert "LeftSemi" in plan


def test_tpch_q4_exists_becomes_semi_join(spark, sf_dir):
    """Correlated EXISTS (with a correlated inequality on o_orderdate)
    must decorrelate to a semi join — never a per-row subquery."""
    plan = plan_of(spark, sf_dir, "tpch_q4_order_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q21_double_correlation_stays_joins(spark, sf_dir):
    """EXISTS + NOT EXISTS, both correlated on key equality plus an
    inequality: the plan must be one semi and one anti join on
    l_orderkey (shuffle-partitionable at 100 TB), with no nested-loop
    fallback."""
    plan = plan_of(spark, sf_dir, "tpch_q21_waiting_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q17_correlated_scalar_agg_decorrelates(spark, sf_dir):
    """Per-part correlated AVG must become an aggregate-then-join on
    l_partkey, not a re-executed subquery."""
    plan = plan_of(spark, sf_dir, "tpch_q17_small_qty_revenue")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def _with_confs(spark, confs: dict):
    """Set confs, returning the previous values for restoration."""
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    return prev


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """The 100 TB posture: dims too big to broadcast (threshold off) +
    a selective dim filter → Spark injects a runtime bloom filter, so
    the fact side drops non-joining rows BEFORE the shuffle. Thresholds
    are lowered here because the fixture scan is tiny; at real scale
    the defaults (10 GB application side) trigger on their own."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = _with_confs(spark, confs)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_degrades_to_smj_not_bnlj_without_broadcast(spark, sf_dir):
    """When dims exceed the broadcast threshold (any real 100 TB run),
    equi-joins must fall back to sort-merge on the key — never to a
    nested-loop join."""
    prev = _with_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"})
    try:
        plan = plan_of(spark, sf_dir, "q06_multiway_join")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_jaccard_tokenizer_evaluates_once(spark, sf_dir):
    """Round-4 regression guard: Catalyst re-inlines projected columns
    into their references, and a tokenizer 'staged' as a column showed
    up 17x in the jaccard index's optimized plan (re-running per
    reference — interpreted HOFs have no CSE). bind() (functions/
    text.py) pins single evaluation; this asserts the optimized plan
    carries exactly one tokenizer split and no unbound re-expansion of
    the shingle hash chain."""
    df = REGISTRY["d_ngram_jaccard_pairs"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, f"tokenizer inlined {plan.count('split(')}x"
    # the token-hash transform appears once inside the bound expression
    # (plus the per-pair xxhash64 folds, bounded by shingle_k + 2)
    assert plan.count("xxhash64") <= 6, f"shingle chain re-expanded: {plan.count('xxhash64')}"


def test_self_join_python_stages_run_once(spark, sf_dir):
    """Python-UDF subplans never canonicalize equal, so self-joins
    re-execute them once per side unless the shared index is
    materialized (lazy localCheckpoint). Guard the three python-backed
    dedup kernels (simhash blocks, minhash bands, ANN signatures): at
    most one Arrow python stage in each executed plan. The materialized
    signature index surfaces as an ExistingRDD scan, so simhash/minhash
    show zero python stages and the embedding ANN shows exactly the one
    post-index pandas stage (dot_batched verification) — a second one
    would mean the signature subplan ran per join side again."""
    import pyspark.sql.functions as F  # noqa: F401

    for name in ("d_simhash_pairs", "d_minhash_pairs", "d_embedding_near_dup_ann"):
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = plan.count("ArrowEvalPython")
        assert n <= 1, f"{name}: python stage planned {n}x (self-join re-execution)"


def test_chunk_documents_is_shuffle_free_and_jvm_only(spark, sf_dir):
    """The chunking operator itself plans NO exchange (embarrassingly
    parallel: tokenize → sequence-explode → slice, all Catalyst) and no
    Python stage; the registry query's only exchange is the final
    1-partition deterministic-order sink."""
    from sparkflow_spark.catalog import Tables
    from sparkflow_spark.operators import chunk_documents

    df = chunk_documents(Tables(spark, sf_dir).documents)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan, "chunking must not shuffle"
    assert "Generate" in plan  # the explode fan-out
    for py in ("BatchEvalPython", "ArrowEvalPython"):
        assert py not in plan


def test_scd2_single_key_exchange(spark, sf_dir):
    """Both SCD2 windows (lag change-detect, lead interval-close) share
    one user_id hash partitioning — exactly one key exchange in the
    whole query (the second Exchange is the final 1-partition order;
    formatted mode prints the partitioning on the Arguments line)."""
    plan = plan_of(spark, sf_dir, "q65_scd2_history")
    assert plan.count("hashpartitioning(") == 1, plan[:2000]


def test_outlier_mad_broadcasts_group_stats(spark, sf_dir):
    """Per-group median/MAD tables ride broadcast joins back onto the
    fact — no fact-sized shuffle for the join, no sort-merge."""
    plan = plan_of(spark, sf_dir, "q66_outlier_mad")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_triangle_and_diff_have_no_cartesian(spark, sf_dir):
    """The wedge-closing joins and the snapshot-diff full outer join
    stay keyed — never BroadcastNestedLoop/Cartesian."""
    for name in ("g_triangle_count", "q64_table_diff", "q70_funnel_stages"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_sample_k_per_group_single_exchange(spark, sf_dir):
    """The deterministic sampler is one group-window pass: exactly one
    key exchange, and a WindowGroupLimit prunes to k per group on the
    map side before the shuffle."""
    from sparkflow_spark.catalog import Tables
    from sparkflow_spark.operators import sample_k_per_group

    df = sample_k_per_group(
        Tables(spark, sf_dir).customer.select("c_custkey", "c_nationkey"),
        "c_nationkey", 3, key_cols=["c_custkey"],
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("hashpartitioning(") == 1
    assert "WindowGroupLimit" in plan


def test_dau_wau_no_cartesian(spark, sf_dir):
    """The 7-day fan-out formulation must stay keyed — exploding to
    window days then joining on the day key, never a range cross."""
    plan = plan_of(spark, sf_dir, "q89_active_users")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_large_output_queries_have_no_single_partition_sort(spark, sf_dir):
    """Registry-authoring contract (round-6): `ordered()`'s
    repartition(1) final is safe ONLY for small finals — any query
    tagged `large-output` (result set scales with the input) must NOT
    funnel its result through a 1-partition exchange. The guard is
    non-vacuous: 14 scaling-output entries carry the tag today, and a
    future registry entry that adds `ordered()` to a tagged query (or
    forgets the tag rules documented on `ordered()`) fails here."""
    from sparkflow_spark.queries import load_all

    reg = load_all()
    tagged = [q for q in reg.values() if "large-output" in q.tags]
    assert len(tagged) >= 14, "large-output tags went missing"
    for q in tagged:
        plan = q.fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        assert "Repartition 1," not in plan, (
            f"{q.name} is tagged large-output but plans a 1-partition "
            "repartition — use an un-sorted final (the oracle compare is "
            "order-insensitive) or drop the tag if the result is bounded"
        )


def test_hard_negative_broadcasts_anchor_side(spark, sf_dir):
    """s_hard_negative_top1's non-equi self-join must be a broadcast
    nested loop (bounded anchor side built+shipped once), never a
    CartesianProduct (which would shuffle-replicate the corpus)."""
    plan = plan_of(spark, sf_dir, "s_hard_negative_top1")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_snm_candidates_are_equi_join_no_cartesian(spark, sf_dir):
    """d_sorted_neighborhood_pairs: candidate generation is a hash/SMJ
    EQUI-join on the dense rank — never a cartesian or nested-loop
    (a naive `abs(rank_a - rank_b) <= w` theta-join would be one).
    The range exchange itself doesn't appear in this plan: global_rank
    truncates lineage at its localCheckpoint (the `Scan ExistingRDD`
    leaves), which is also what guarantees it runs once however many
    times the ranked frame is referenced."""
    plan = plan_of(spark, sf_dir, "d_sorted_neighborhood_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan  # the checkpoint-truncated rank
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan)


def test_link_prediction_no_cartesian_wedge(spark, sf_dir):
    """g_link_prediction's wedge closure and degree joins must stay
    hash/sort-merge equi-joins; only the (tiny) hub list may broadcast."""
    plan = plan_of(spark, sf_dir, "g_link_prediction")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
