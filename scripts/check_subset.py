#!/usr/bin/env python
"""Targeted oracle differential: python scripts/check_subset.py <sf_dir> name1,name2,..."""
import sys, time
sys.path.insert(0, ".")
from sparkflow_spark.oracle import run_all
from sparkflow_spark.session import build_session

sf_dir = sys.argv[1]
names = sys.argv[2].split(",")
spark = build_session(app_name="subset_check")
t0 = time.time()
results = run_all(spark, sf_dir, names=names)
for r in results:
    print(("OK  " if r.match else "FAIL"), r.name, r.detail[:140])
print(f"{len([r for r in results if r.match])}/{len(results)} in {time.time()-t0:.1f}s")
sys.exit(1 if any(not r.match for r in results) else 0)
