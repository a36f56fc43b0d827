#!/usr/bin/env python
"""Run the full oracle differential at an arbitrary sf dir (default: the
driver's t2 scale, sf0.01). Mirrors CORRECTNESS_r{N}.json locally.

Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from sparkflow_spark.oracle import run_all
from sparkflow_spark.session import build_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="check_correctness")
    t0 = time.time()
    results = run_all(spark, sf_dir)
    failed = [r for r in results if not r.match]
    for r in results:
        status = "OK  " if r.match else "FAIL"
        print(f"{status} {r.name:32s} rows={r.spark_rows} {r.detail[:160]}")
    print(f"\n{len(results) - len(failed)}/{len(results)} matched in {time.time() - t0:.1f}s @ {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
