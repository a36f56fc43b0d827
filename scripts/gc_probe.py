#!/usr/bin/env python
"""A/B probe for the d_ngram IN-SESSION edge (r8 verdict ask #2).

Reproduces the bench session's shape — full v1 HEADLINE cold pass then
three steady passes — under a parametrized JVM/memory config, and
reports the d_ngram steady median, the v1 steady total, and the
same-session DuckDB d_ngram denominator. Run once per config on a
quiet box:

    python scripts/gc_probe.py baseline
    python scripts/gc_probe.py region32     # -XX:G1HeapRegionSize=32m
    python scripts/gc_probe.py offheap      # 8g Tungsten off-heap
    python scripts/gc_probe.py region32_offheap

The hypothesis space (BASELINE.md round-8): the penalty is inter-query
GC state on array-heavy shapes late in a 16-query session. 20 GiB heap
already recovered 1.53->1.35 s; G1HeapRegionSize targets humongous
allocations (collect_list doc arrays / Arrow batches > 1/2 region),
off-heap moves Tungsten sort/agg buffers out of the GC's way.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS: dict[str, dict[str, str]] = {
    "baseline": {},
    "region32": {
        "spark.driver.extraJavaOptions": "-XX:G1HeapRegionSize=32m",
    },
    "region64": {
        "spark.driver.extraJavaOptions": "-XX:G1HeapRegionSize=64m",
    },
    "offheap": {
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "8g",
    },
    "region32_offheap": {
        "spark.driver.extraJavaOptions": "-XX:G1HeapRegionSize=32m",
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "8g",
    },
    "gchint": {},  # System.gc() between queries (harness-level lever)
    "codegen1000": {
        # default 100 generated-class entries: a 16-query session's
        # stages overflow it, so every pass Janino-recompiles the
        # evicted shapes (matches the observed "back-to-back converges,
        # interleaved doesn't" signature)
        "spark.sql.codegen.cache.maxEntries": "1000",
    },
}


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = CONFIGS[mode]

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"gc_probe_{mode}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    )
    for k, v in extra.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from bench import HEADLINE, execute
    from sparkflow_spark.queries import load_all

    registry = load_all()
    execute(registry["q13_hash_agg_tpch_q1"].fn(spark, sf_dir))
    execute(registry["q40_pandas_udf_scalar"].fn(spark, sf_dir))

    passes: list[dict[str, float]] = [{}, {}, {}, {}]
    for p in passes:
        for name in HEADLINE:
            if name == "st_tumbling_hour_counts":
                continue  # streaming floor — irrelevant to the GC probe
            if mode == "gchint":
                spark._jvm.System.gc()
            t0 = time.perf_counter()
            execute(registry[name].fn(spark, sf_dir))
            p[name] = round(time.perf_counter() - t0, 3)
    steady = {
        n: sorted(p[n] for p in passes[1:]) [1]
        for n in passes[0]
    }

    from sparkflow_spark.oracle import duckdb_connection

    con = duckdb_connection(sf_dir)
    q = registry["d_ngram_jaccard_pairs"].oracle
    con.execute(q).fetchall()
    t0 = time.perf_counter()
    con.execute(q).fetchall()
    duck_ngram = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "mode": mode,
                "d_ngram_steady": steady["d_ngram_jaccard_pairs"],
                "d_ngram_passes": [p["d_ngram_jaccard_pairs"] for p in passes],
                "v1_steady_total_no_stream": round(sum(steady.values()), 3),
                "duckdb_d_ngram_same_session": duck_ngram,
                "ratio_d_ngram": round(
                    steady["d_ngram_jaccard_pairs"] / duck_ngram, 2
                ),
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
