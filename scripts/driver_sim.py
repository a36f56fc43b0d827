#!/usr/bin/env python
"""Fresh-process BARE-session simulation of the driver's verify step.

The driver does NOT run inside this repo: its cwd is elsewhere, its
SparkSession is built with no custom configs (so Spark 4 defaults apply,
including ANSI mode ON), and it imports ``__spark_entry__`` by file
path.  Executor Python workers therefore can't ``import sparkflow_spark``
unless the entry path ships the package itself (session.ship_package →
addPyFile) — a failure mode a repo-cwd test can never catch.

Run it from OUTSIDE the repo:

    cd /tmp && python /root/repo/scripts/driver_sim.py [n | names...]

With no args it checks the driver's 50-entry window; ``all`` checks the
full registry; an integer checks the first N entries; names check just
those queries.  The compare mirrors the driver: columns sorted by name,
order-insensitive rows, strict value canonicalization (this file is
self-contained on purpose — importing the repo's oracle module would
drag repo-session helpers into what must stay a bare environment).
"""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_value(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(float(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_value)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    if os.path.abspath(os.getcwd()).startswith(REPO):
        print("driver_sim: run from OUTSIDE the repo (e.g. cd /tmp) — "
              "a repo cwd masks import-path failures the driver would hit.")
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    # Import the entry file as the driver does: by path, with the repo dir
    # on the DRIVER's sys.path (the driver grants that much — the gap this
    # sim exists to catch is the EXECUTOR python workers, which inherit
    # neither cwd nor sys.path and need session.ship_package/addPyFile).
    sys.path.insert(0, REPO)
    spec = importlib.util.spec_from_file_location("__spark_entry__", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # Bare session: Spark 4 defaults, ANSI on, none of session.py's configs.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[32]").appName("driver_sim").getOrCreate()

    queries = mod.queries()
    oracles = mod.oracle_sql()
    names = list(queries)
    args = sys.argv[1:]
    if args == ["all"]:
        pass
    elif len(args) == 1 and args[0].isdigit():
        names = names[: int(args[0])]
    elif args:
        names = args
    else:
        names = names[:50]

    # Fixture-drift tripwire: under the engine's configs events.ts must be
    # LTZ timestamp or every withWatermark query dies (round-3 regression).
    from sparkflow_spark.catalog import load_table
    from sparkflow_spark.session import ensure_runtime_configs

    ts_dtype = dict(load_table(ensure_runtime_configs(spark), sf_dir, "events").dtypes)["ts"]
    if ts_dtype != "timestamp":
        print(f"TRIPWIRE: events.ts reads as {ts_dtype!r}, expected 'timestamp' — "
              "fixture drift; see catalog.normalize_event_time / "
              "tests/test_fixture_contract.py")
        return 3

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )

    t0 = time.time()
    n_ok = n_rows_only = 0
    failures: list[str] = []
    for name in names:
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failures.append(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            print(f"FAIL {name:34s} spark-side error: {e}")
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"ok   {name:34s} rows={len(sdf)} (rows-only, no oracle)")
            continue
        o = _canon(con.execute(oracles[name]).fetchdf())
        s = _canon(sdf)
        if list(s.columns) != list(o.columns):
            failures.append(f"{name}: columns {list(s.columns)} vs {list(o.columns)}")
            print(f"FAIL {name:34s} column mismatch")
        elif len(s) != len(o):
            failures.append(f"{name}: rows {len(s)} vs {len(o)}")
            print(f"FAIL {name:34s} row count {len(s)} vs {len(o)}")
        elif len(s) and not s.equals(o):
            neq = (s != o).any(axis=1)
            i = int(s.index[neq][0])
            failures.append(f"{name}: value mismatch row{i}")
            print(f"FAIL {name:34s} value mismatch: spark={s.loc[i].to_dict()} "
                  f"oracle={o.loc[i].to_dict()}")
        else:
            n_ok += 1
            print(f"OK   {name:34s} rows={len(s)}")
    print(f"\n{n_ok} hash-ok + {n_rows_only} rows-only of {len(names)} "
          f"in {time.time() - t0:.1f}s @ {sf_dir} (bare session, cwd={os.getcwd()})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
