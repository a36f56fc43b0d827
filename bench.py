#!/usr/bin/env python
"""BENCH harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": <sf>}

Each query executes to Spark's noop sink (full computation, no driver
collect), warm session, JVM startup excluded (a warmup query runs
first). Per-query seconds let BASELINE.md track the ≤2×-DuckDB target
per shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkflow_spark.queries import load_all
from sparkflow_spark.session import build_session

# Representative spread: scan/filter, joins, aggs, windows, top-k, scalar
# functions, JSON, text, dedup join, vector search, ML inference,
# streaming, multimodal.
HEADLINE = [
    "q02_filter_and",
    "q06_multiway_join",
    "q11_theta_join",
    "q13_hash_agg_tpch_q1",
    "q14_count_distinct",
    "q19_window_topk_per_group",
    "q21_window_running_sum",
    "q22_topk_global",
    "q28_math_functions",
    "q30_json_extract",
    "t_token_count",
    "d_ngram_jaccard_pairs",
    "s_brute_force_top1",
    "m02_linear_inference",
    "mm_binary_stats",
    "st_tumbling_hour_counts",
]

# Second headline list (round-6, ADDITIVE — the 16-query HEADLINE total
# stays cross-round comparable): the heavier LLM-pipeline/analytics
# shapes the engine is actually for. Reported as separate v2_* fields.
HEADLINE_V2 = [
    "p_clean_corpus",
    "t_bm25_scores",
    "q80_multitouch_attribution",
    "q89_active_users",
]


def execute(df) -> None:
    """Force full computation without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="sparkflow_bench")
    registry = load_all()

    # warm the JVM/codegen/catalog, the Arrow python-worker pool, AND the
    # structured-streaming machinery (state store provider, micro-batch
    # executor, memory sink) outside the measured window — warm-session
    # semantics per BASELINE.md: engine-lifetime one-time costs are
    # excluded, steady-state per-query cost is what's measured. The
    # streaming warmup runs at sf0.001 so it contributes engine init,
    # not data processing.
    execute(registry["q13_hash_agg_tpch_q1"].fn(spark, sf_dir))
    execute(registry["q40_pandas_udf_scalar"].fn(spark, sf_dir))
    # smallest available sibling sf dir (fall back to sf_dir itself) so
    # the warmup contributes engine init, not data processing
    parent = os.path.dirname(sf_dir.rstrip("/"))
    warm_sf = next(
        (
            os.path.join(parent, d)
            for d in ("sf0.001", "sf0.01")
            if os.path.isdir(os.path.join(parent, d))
        ),
        sf_dir,
    )
    execute(registry["st_tumbling_hour_counts"].fn(spark, warm_sf))

    # Pass 1 (cold) pays per-shape one-time costs: Catalyst analysis of
    # the full tree, whole-stage-codegen Janino compilation, broadcast
    # warm-up. Steady state is the recurring cost of the shape — what a
    # production pipeline that runs the same query shapes repeatedly (or
    # a long job over 100 TB where compile amortizes over thousands of
    # tasks) actually pays. At toy scale a SINGLE steady pass is noise-
    # bound: JVM C2 compilation of interpreted expression paths and GC
    # land randomly across queries, moving individual readings ±0.3 s
    # and the 16-query total ±0.6 s between runs (measured r5: 7.15 vs
    # 8.24 on identical code). Steady is therefore the PER-QUERY MEDIAN
    # of three post-cold passes — every pass is a complete re-execution
    # from the parquet scans (plans are reused, data work is not), the
    # median just rejects the noise. Headline `value` stays the COLD
    # pass — the same single-pass methodology as rounds 1-2 and the
    # DuckDB baseline, so totals stay comparable across rounds.
    cold: dict[str, float] = {}
    steady_passes: list[dict[str, float]] = [{}, {}, {}]
    for sink in (cold, *steady_passes):
        for name in HEADLINE:
            t0 = time.perf_counter()
            execute(registry[name].fn(spark, sf_dir))
            sink[name] = round(time.perf_counter() - t0, 3)
    steady = {
        name: sorted(p[name] for p in steady_passes)[1] for name in HEADLINE
    }

    # v2 set: same cold-then-3×-steady-median methodology, measured
    # AFTER the v1 block so v1 totals stay comparable with rounds 1-5.
    v2_cold: dict[str, float] = {}
    v2_passes: list[dict[str, float]] = [{}, {}, {}]
    for sink in (v2_cold, *v2_passes):
        for name in HEADLINE_V2:
            t0 = time.perf_counter()
            execute(registry[name].fn(spark, sf_dir))
            sink[name] = round(time.perf_counter() - t0, 3)
    v2_steady = {
        name: sorted(p[name] for p in v2_passes)[1] for name in HEADLINE_V2
    }

    # Same-session DuckDB denominator (r6 verdict ask #3): the ≤2×
    # target is only meaningful against a DuckDB number measured on
    # THIS host under THIS load, in the same process lifetime as the
    # Spark passes — a stale denominator from a quieter session
    # understated the ratio by ~2× in r5/r6. Warm pass then a timed
    # pass per oracle SQL (fetchall materializes, matching how the
    # baseline was originally timed). Oracle-less entries are skipped
    # and listed so the ratio's coverage is explicit.
    from sparkflow_spark.oracle import duckdb_connection

    con = duckdb_connection(sf_dir)
    duck: dict[str, float] = {}
    duck_passes: dict[str, list[float]] = {}
    duck_skipped: list[str] = []
    for name in HEADLINE + HEADLINE_V2:
        q = registry[name].oracle
        if q is None:
            duck_skipped.append(name)
            continue
        con.execute(q).fetchall()  # warm
        # MEDIAN of three timed passes (r9): the single-pass denominator
        # was the bench's noisiest reading — scripts/gc_probe.py measured
        # the same d_ngram SQL at 0.387–2.219 s (5.7×) across five
        # back-to-back sessions on one box, purely host load. The Spark
        # side already medians three steady passes; the ratio is only
        # meaningful if both sides reject load spikes the same way.
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(q).fetchall()
            ts.append(round(time.perf_counter() - t0, 3))
        duck_passes[name] = ts
        duck[name] = sorted(ts)[1]
    duck_v1 = round(sum(duck.get(n, 0.0) for n in HEADLINE), 3)
    duck_v2 = round(sum(duck.get(n, 0.0) for n in HEADLINE_V2), 3)

    # Work-bound floor for the AGGREGATE ratios (r12 verdict ask #4 —
    # BASELINE.md round-13 contract amendment): a sub-0.1 s DuckDB
    # median is session-overhead-bound, not work-bound; the round-10
    # floor rule already voids per-ROW ratio verdicts below it, but the
    # v2 aggregate kept floor-bound members in its denominator, so the
    # headline drifted with box weather (driver 1.09 vs judge-box 1.25
    # on identical code). The *_workbound ratios divide only over
    # members whose DuckDB median clears the floor; raw compositions
    # stay reported for cross-round continuity.
    FLOOR = 0.1

    def workbound_ratio(names: list[str], spark_side: dict[str, float]):
        wb = [n for n in names if duck.get(n, 0.0) >= FLOOR]
        excluded = [n for n in names if n not in wb]
        denom = sum(duck[n] for n in wb)
        ratio = round(sum(spark_side[n] for n in wb) / denom, 2) if denom else None
        return ratio, wb, excluded

    ratio_v1_wb, v1_wb, v1_floored = workbound_ratio(HEADLINE, steady)
    ratio_v2_wb, v2_wb, v2_floored = workbound_ratio(HEADLINE_V2, v2_steady)

    # Round-14 contract amendment (r13 verdict ask #2): the bulky
    # raw-passes blobs live in a SIDECAR file referenced by path, so
    # the driver-facing line stays short enough that its tail capture
    # can never truncate mid-JSON (BENCH_r12's line outgrew the
    # driver's capture and the whole round-over-round comparison was
    # lost). Every scalar/contract field stays on the line; only the
    # per-pass arrays move. Best-effort: a read-only checkout still
    # prints the full contract line.
    sidecar_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_passes.json"
    )
    try:
        with open(sidecar_path, "w") as fh:
            json.dump(
                {
                    "queries_steady_passes": steady_passes,
                    "v2_queries_steady_passes": v2_passes,
                    "duckdb_queries_passes": duck_passes,
                },
                fh,
            )
    except OSError:
        sidecar_path = None

    timings = cold
    total = round(sum(cold.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "methodology": "cold_1st_pass; vs rounds 1-2: streaming ENGINE init (state store/micro-batch exec) is warmed outside the window since r3, so st_tumbling cold excludes ~1s of one-time init r1/r2 included; steady_* is the per-query MEDIAN of three full post-cold re-executions (single-pass steady readings vary +-0.3s/query from JIT+GC at toy scale; every pass recomputes from the parquet scans)",
                "steady_total": round(sum(steady.values()), 3),
                "queries_steady": steady,
                "passes_sidecar": sidecar_path,
                "v2_total": round(sum(v2_cold.values()), 3),
                "v2_queries": v2_cold,
                "v2_steady_total": round(sum(v2_steady.values()), 3),
                "v2_queries_steady": v2_steady,
                "duckdb_same_session": {
                    "queries": duck,
                    "skipped_no_oracle": duck_skipped,
                    "v1_total": duck_v1,
                    "v2_total": duck_v2,
                    "ratio_v1_steady": round(sum(steady.values()) / duck_v1, 2)
                    if duck_v1
                    else None,
                    "ratio_v2_steady": round(sum(v2_steady.values()) / duck_v2, 2)
                    if duck_v2
                    else None,
                    # the CONTRACT ratios since round 13 (BASELINE.md
                    # amendment): floor-bound members excluded from the
                    # aggregate so the bar can't drift with box weather
                    "workbound_floor_sec": FLOOR,
                    "ratio_v1_steady_workbound": ratio_v1_wb,
                    "v1_floor_excluded": v1_floored,
                    "ratio_v2_steady_workbound": ratio_v2_wb,
                    "v2_floor_excluded": v2_floored,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
