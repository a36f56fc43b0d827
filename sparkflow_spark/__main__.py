"""CLI: list / run / explain registry queries, or run ad-hoc SQL.

    python -m sparkflow_spark list [tag]
    python -m sparkflow_spark run <query> [--sf DIR] [--limit N]
    python -m sparkflow_spark explain <query> [--sf DIR]
    python -m sparkflow_spark sql "SELECT ..." [--sf DIR]

Runs on a local session with the engine's runtime configs; ``--sf``
defaults to $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sparkflow_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries")
    p_list.add_argument("tag", nargs="?", help="filter by tag substring")

    default_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf", default=default_sf)
        if name == "run":
            p.add_argument("--limit", type=int, default=20)

    p_sql = sub.add_parser("sql", help="ad-hoc SQL over the fixture views")
    p_sql.add_argument("text")
    p_sql.add_argument("--sf", default=default_sf)
    p_sql.add_argument("--limit", type=int, default=20)

    args = ap.parse_args(argv)

    from sparkflow_spark.queries import load_all

    registry = load_all()

    if args.cmd == "list":
        for q in registry.values():
            if args.tag and not any(args.tag in t for t in q.tags):
                continue
            kind = "t2-oracle" if q.oracle else "rows-only"
            print(f"{q.name:36s} [{', '.join(q.tags)}] {kind}")
        return 0

    from sparkflow_spark.session import build_session

    spark = build_session(app_name=f"cli_{args.cmd}")
    if args.cmd == "sql":
        from sparkflow_spark.catalog import register_views

        register_views(spark, args.sf)
        spark.sql(args.text).show(args.limit, truncate=False)
        return 0

    q = registry.get(args.query)
    if q is None:
        print(f"unknown query {args.query!r}; try: python -m sparkflow_spark list",
              file=sys.stderr)
        return 2
    df = q.fn(spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
