#!/usr/bin/env python
"""Per-batch anatomy of the streaming entries (r14, guide §1).

Monkeypatches windows.run_stream_to_memory to capture every completed
batch's StreamingQueryProgress (durationMs breakdown: queryPlanning,
addBatch, getBatch, walCommit/commitOffsets, triggerExecution;
numInputRows; stateOperators commit/total-rows) while running the
REGISTRY entry unchanged, then prints per-entry: wall seconds per pass,
batch count, empty-batch count, and the durationMs sums.

Usage: python scripts/stream_anatomy.py entry1,entry2 [--passes N] [--sf DIR] [--json OUT]
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
from sparkflow_spark.streaming import windows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("only")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    captured: list[list[dict]] = []
    orig = windows.run_stream_to_memory

    def wrapped(sdf, output_mode, **kw):
        # same body as the original, but keep the query handle so we can
        # read recentProgress after it stops
        import uuid as _uuid

        spark = sdf.sparkSession
        name = f"st_{_uuid.uuid4().hex[:12]}"
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        drain = kw.get("drain", "terminate")
        if drain == "terminate":
            q.awaitTermination()
        else:
            deadline = time.time() + kw.get("settle_timeout", 60.0)
            last_pid, last_count, empty_quiet = None, -1, 0
            need = kw.get("settle_quiet_batches", 2)
            while time.time() < deadline:
                prog = q.lastProgress
                if prog is not None and prog["batchId"] != last_pid:
                    n = spark.table(name).count()
                    if prog["numInputRows"] == 0 and n == last_count:
                        empty_quiet += 1
                    else:
                        empty_quiet = 0
                    last_pid, last_count = prog["batchId"], n
                    if empty_quiet >= need:
                        break
                time.sleep(kw.get("settle_secs", 0.1))
            q.stop()
            q.awaitTermination()
        captured.append([dict(p.asDict()) if hasattr(p, "asDict") else p for p in []])
        # recentProgress returns JSON strings in some versions; normalize
        progs = []
        for p in q.recentProgress:
            if isinstance(p, str):
                progs.append(json.loads(p))
            else:
                try:
                    progs.append(json.loads(p.json))
                except Exception:
                    progs.append({})
        captured[-1] = progs
        return spark.table(name)

    windows.run_stream_to_memory = wrapped
    # stateful.py imported run_stream_to_memory by name at module import
    from sparkflow_spark.streaming import stateful

    stateful.run_stream_to_memory = wrapped

    spark = build_session(app_name="stream_anatomy")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    def execute(df):
        df.write.format("noop").mode("overwrite").save()

    # engine warmup (same as bench.py)
    execute(registry["q13_hash_agg_tpch_q1"].fn(spark, args.sf))
    execute(registry["st_tumbling_hour_counts"].fn(spark, "/root/testdata/sf0.001"))

    out: dict[str, dict] = {}
    for name in args.only.split(","):
        q = registry[name]
        rows = []
        for i in range(args.passes):
            captured.clear()
            t0 = time.perf_counter()
            execute(q.fn(spark, args.sf))
            wall = round(time.perf_counter() - t0, 3)
            runs = []
            for progs in captured:
                batches = []
                for p in progs:
                    d = p.get("durationMs", {})
                    so = p.get("stateOperators", [])
                    batches.append(
                        {
                            "batchId": p.get("batchId"),
                            "rows": p.get("numInputRows"),
                            "triggerExecution": d.get("triggerExecution"),
                            "queryPlanning": d.get("queryPlanning"),
                            "addBatch": d.get("addBatch"),
                            "getBatch": d.get("getBatch"),
                            "walCommit": d.get("walCommit"),
                            "commitOffsets": d.get("commitOffsets"),
                            "stateCommitMs": sum(
                                s.get("commitTimeMs", 0) for s in so
                            ),
                            "stateRowsTotal": sum(
                                s.get("numRowsTotal", 0) for s in so
                            ),
                        }
                    )
                runs.append(batches)
            rows.append({"wall": wall, "runs": runs})
            n_batches = sum(len(r) for r in runs)
            n_empty = sum(1 for r in runs for b in r if b["rows"] == 0)
            tot_trig = sum(
                (b["triggerExecution"] or 0) for r in runs for b in r
            )
            tot_plan = sum((b["queryPlanning"] or 0) for r in runs for b in r)
            tot_add = sum((b["addBatch"] or 0) for r in runs for b in r)
            print(
                f"{name} pass{i}: wall={wall}s queries={len(runs)} "
                f"batches={n_batches} empty={n_empty} "
                f"trigSum={tot_trig}ms planSum={tot_plan}ms addSum={tot_add}ms",
                flush=True,
            )
        out[name] = {"passes": rows}
    windows.run_stream_to_memory = orig
    stateful.run_stream_to_memory = orig
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
