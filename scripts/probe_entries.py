#!/usr/bin/env python
"""Targeted re-measure of specific registry entries (r13 batch work).

Same methodology as opt_sweep.py (noop sink, cold + N steady passes,
job descriptions) but over --only entries, with optional plan dump.

Usage: python scripts/probe_entries.py name1,name2 [--passes N]
       [--plans-dir D] [--suffix _before] [--json OUT] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkflow_spark.queries import load_all
from sparkflow_spark.session import build_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("only")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = build_session(app_name="probe_entries")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = [n for n in args.only.split(",") if n]

    # engine warmup outside every per-entry window
    registry["q13_hash_agg_tpch_q1"].fn(spark, args.sf).write.format(
        "noop"
    ).mode("overwrite").save()

    results: dict[str, dict] = {}
    for name in names:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        passes = []
        df = None
        for _ in range(args.passes + 1):
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            passes.append(round(time.perf_counter() - t0, 3))
        st = sorted(passes[1:])
        row = {
            "cold": passes[0],
            "steady": st[len(st) // 2],
            "passes": passes,
        }
        if args.plans_dir and df is not None:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_dir, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
        results[name] = row
        print(f"{name:40s} cold={row['cold']} steady={row['steady']} {passes}", flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
