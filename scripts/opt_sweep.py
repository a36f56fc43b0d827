#!/usr/bin/env python
"""Round-13 optimization sweep: time EVERY registry entry to the noop
sink at a given sf dir and dump its formatted plan.

For each entry: 1 cold + N steady passes (noop sink per guide §1.4 —
full computation, no driver collect), per-query job descriptions, plan
text written to --plans-dir/<name>.txt. Eager entries (memo=False:
streaming runs, training, index lifecycles) are timed the same way but
the "plan" captured is the final frame's.

Usage:
  python scripts/opt_sweep.py [sf_dir] [--passes N] [--plans-dir D]
                              [--only a,b,c] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkflow_spark.queries import load_all
from sparkflow_spark.session import build_session


def execute(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--json", dest="json_out", default=None)
    # r14 (r13 verdict ask #8): a 314-entry single-session sweep
    # accumulates driver state (memory-sink tables, broadcast blocks,
    # codegen cache churn) and LATE entries read 2-10x worse in-sweep
    # than isolated. --fresh-every N runs the sweep in chunks of N
    # entries, each in a FRESH python+JVM subprocess, and merges the
    # JSONs — bounding the session age any entry can see.
    ap.add_argument("--fresh-every", type=int, default=None)
    args = ap.parse_args()

    if args.fresh_every:
        import subprocess
        import tempfile

        names = [
            n
            for n in load_all()
            if not args.only or n in set(args.only.split(","))
        ]
        merged: dict[str, dict] = {}
        chunks = [
            names[i : i + args.fresh_every]
            for i in range(0, len(names), args.fresh_every)
        ]
        for ci, chunk in enumerate(chunks):
            with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
                part = tf.name
            cmd = [
                sys.executable,
                os.path.abspath(__file__),
                args.sf_dir,
                "--passes",
                str(args.passes),
                "--only",
                ",".join(chunk),
                "--json",
                part,
            ]
            if args.plans_dir:
                cmd += ["--plans-dir", args.plans_dir]
            print(f"== chunk {ci + 1}/{len(chunks)} ({len(chunk)} entries, fresh session) ==", flush=True)
            subprocess.run(cmd, check=False)
            try:
                with open(part) as f:
                    merged.update(json.load(f))
                os.unlink(part)
            except (OSError, json.JSONDecodeError) as exc:
                print(f"chunk {ci + 1} result unreadable: {exc}", flush=True)
        order = sorted(
            (n for n, r in merged.items() if r.get("steady") is not None),
            key=lambda n: -merged[n]["steady"],
        )
        print("\n== slowest by steady (merged) ==")
        for n in order[:40]:
            print(f"{merged[n]['steady']:8.3f}s  cold={merged[n]['cold']:8.3f}s  {n}")
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(merged, f, indent=1, sort_keys=True)
        return 0

    spark = build_session(app_name="opt_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    only = set(args.only.split(",")) if args.only else None

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    # Warm engine one-time costs outside the per-query window.
    execute(registry["q13_hash_agg_tpch_q1"].fn(spark, args.sf_dir))
    execute(registry["q40_pandas_udf_scalar"].fn(spark, args.sf_dir))

    results: dict[str, dict] = {}
    for name, q in registry.items():
        if only and name not in only:
            continue
        row: dict = {"memo": q.memo, "oracle": q.oracle is not None}
        try:
            spark.sparkContext.setJobDescription(f"opt_sweep:{name}")
            passes = []
            for i in range(args.passes + 1):
                t0 = time.perf_counter()
                df = q.fn(spark, args.sf_dir)
                execute(df)
                passes.append(round(time.perf_counter() - t0, 3))
            row["cold"] = passes[0]
            st = sorted(passes[1:])
            row["steady"] = st[len(st) // 2] if st else None
            row["passes"] = passes
            if args.plans_dir:
                try:
                    plan = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
                    with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as f:
                        f.write(plan)
                except Exception:
                    pass
        except Exception as exc:  # record, keep sweeping
            row["error"] = f"{type(exc).__name__}: {exc}"
            traceback.print_exc(limit=3)
        finally:
            spark.sparkContext.setJobDescription(None)
        results[name] = row
        state = row.get("error") or f"cold={row['cold']} steady={row['steady']}"
        print(f"{name:40s} {state}", flush=True)

    order = sorted(
        (n for n, r in results.items() if "steady" in r and r["steady"] is not None),
        key=lambda n: -results[n]["steady"],
    )
    print("\n== slowest by steady ==")
    for n in order[:40]:
        print(f"{results[n]['steady']:8.3f}s  cold={results[n]['cold']:8.3f}s  {n}")
    errs = [n for n, r in results.items() if "error" in r]
    if errs:
        print("\n== errors ==")
        for n in errs:
            print(f"{n}: {results[n]['error']}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
