#!/usr/bin/env python
"""dHash banded-join growth probe on a NON-duplication data model
(r12 verdict ask #7).

The round-12 ×64 probe scaled documents by DUPLICATION (64 copies of
each text), so every near-copy group grew to 64 members and
d_dhash_hamming_pairs' output grew quadratically (612k pairs) — a
property of that growth model, not of the algorithm. This probe closes
the loop with a growth model where the data's pair structure is
LINEAR: every copy k of a document gets a copy-unique 96-hex-char
prefix (three chained md5s of (k, doc_id)), so the 72-byte raster —
derived from the FIRST bytes of the payload — is unique per
(copy, doc) and two copies of one document share no dHash structure
(random 64-bit hashes collide within hamming ≤ 3 with p ≈ 2.4e-15).
Each copy still receives its own planted one-pixel variants through
the entry's own synthesis (%21 lattice preserved: the copy shift is a
multiple of lcm(3,21,60)), so expected output = copies × per-copy
planted pairs — linear growth of both data and result.

If the banded join were secretly quadratic in candidates, its wall
clock would blow up here exactly as it would at 100 TB; linear output
with near-linear wall closes the r12 watch-item.

Usage: python scripts/dhash_growth_probe.py [--scales 1,16,64] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from sparkflow_spark.queries import clear_result_memo, load_all
from sparkflow_spark.session import build_session

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/sparkflow_dhash_growth"
# copy shift: multiple of lcm(3, 21, 60) = 420 so the entry's %3 / %21
# selection and %60 perturbation position are identical in every copy
SHIFT = 420_000


def build_scale(spark, n_copies: int) -> str:
    out = os.path.join(WORK, f"x{n_copies}")
    dst = os.path.join(out, "documents.parquet")
    if os.path.exists(dst):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    legs = []
    for k in range(n_copies):
        tag = F.concat(F.lit(f"{k}_"), F.col("doc_id").cast("string"))
        prefix = F.concat(F.md5(tag), F.md5(F.concat(tag, F.lit("a"))),
                          F.md5(F.concat(tag, F.lit("b"))))
        legs.append(
            docs.select(
                (F.col("doc_id") + k * SHIFT).alias("doc_id"),
                F.concat(prefix, F.col("text")).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    df = legs[0]
    for leg in legs[1:]:
        df = df.unionByName(leg)
    df.repartition(32).write.mode("overwrite").parquet(dst)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,16,64")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = build_session(app_name="dhash_growth_probe")
    fn = load_all()["d_dhash_hamming_pairs"].fn
    results = []
    base = None
    for n in scales:
        sf_dir = build_scale(spark, n)
        clear_result_memo()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        clear_result_memo()
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        rec = {"scale": n, "pairs": rows, "wall_s": round(wall, 2)}
        if base is None:
            base = rec
        rec["pairs_ratio"] = round(rows / base["pairs"], 2) if base["pairs"] else None
        rec["wall_ratio"] = round(wall / base["wall_s"], 2)
        rec["per_row_ratio"] = (
            round((wall / base["wall_s"]) / n, 3) if n else None
        )
        results.append(rec)
        print(json.dumps(rec))

    print("\n| scale | pairs | pairs ratio | wall (s) | wall ratio | per-copy wall |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| ×{r['scale']} | {r['pairs']:,} | {r['pairs_ratio']}× "
            f"| {r['wall_s']} | {r['wall_ratio']}× | {r['per_row_ratio']}× |"
        )
    if not args.keep:
        shutil.rmtree(WORK, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
