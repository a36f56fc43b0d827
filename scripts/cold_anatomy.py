#!/usr/bin/env python
"""Anatomy of a query's COLD pass: replicate bench.py's warmup, run the
target entry once, and print per-job wall clock + stage metrics from the
status tracker (r13 — hunting the d_ngram_jaccard_pairs 7-13 s cold).

Usage: python scripts/cold_anatomy.py [entry] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkflow_spark.queries import load_all
from sparkflow_spark.session import build_session


def execute(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    entry = sys.argv[1] if len(sys.argv) > 1 else "d_ngram_jaccard_pairs"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = build_session(app_name="cold_anatomy")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # bench.py's exact warmup
    execute(registry["q13_hash_agg_tpch_q1"].fn(spark, sf_dir))
    execute(registry["q40_pandas_udf_scalar"].fn(spark, sf_dir))
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

    tracker = spark.sparkContext.statusTracker()
    before_jobs = set(tracker.getJobIdsForGroup() or [])

    t0 = time.perf_counter()
    df = registry[entry].fn(spark, sf_dir)
    t_build = time.perf_counter() - t0
    execute(df)
    t_total = time.perf_counter() - t0
    print(f"\n{entry}: plan-build {t_build:.2f}s, total cold {t_total:.2f}s")

    # second + third pass for contrast
    for i in (2, 3):
        t1 = time.perf_counter()
        execute(registry[entry].fn(spark, sf_dir))
        print(f"pass {i}: {time.perf_counter() - t1:.2f}s")

    # per-job accounting via the JVM AppStatusStore (jobs since warmup)
    store = spark._jsparkSession.sparkContext.statusStore()
    it = store.jobsList(None)
    n = it.size()
    print("\njobs (id, name, submit->completion ms, stages):")
    rows = []
    for i in range(n):
        j = it.apply(i)
        jid = j.jobId()
        sub = j.submissionTime()
        comp = j.completionTime()
        try:
            subms = sub.get().getTime()
            compms = comp.get().getTime()
            dur = compms - subms
        except Exception:
            dur = -1
        rows.append((jid, dur, j.name()[:90]))
    for jid, dur, name in sorted(rows):
        print(f"  job {jid:3d} {dur:7d} ms  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
