#!/usr/bin/env python
"""×N probe of the sfl Python Data Source (r11 verdict ask #7).

The sfl format's per-row python parse is DISCLOSED as the extension-
point cost (sources_python.py module docstring: "this is the EXTENSION
point, not the fast path") — this probe puts a NUMBER on that claim:
write + read wall times at ×1/×16/×64 of a 100k-row base, for

- the row-tuple read path (default),
- the Arrow RecordBatch read path (option("arrow", "true")),
- a parquet twin of the same data (the JVM bulk path, as the floor).

Per-row ratios (t(×N)/t(×1) / N) show whether the python orchestration
scales linearly (it should: shards parse in parallel on executors, the
driver reads only the manifest) and how far the codec sits from the
JVM format — the honest gap a user choosing the extension point should
see. Readings land in SCALE.md round-12.

Usage: python scripts/sfl_probe.py [--scales 1,16,64] [--base-rows 100000]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

WORK = "/tmp/sparkflow_sfl_probe"


def _dataset(spark, n: int):
    import pyspark.sql.functions as F

    return (
        spark.range(n)
        .withColumn("user", F.concat(F.lit("user_"), (F.col("id") % 997)))
        .withColumn("v", (F.col("id") % 10000) / 7.0)
        .withColumn("flag", F.col("id") % 3 == 0)
        .select("id", "user", "v", "flag")
    )


def probe_scale(spark, n: int, shards: int) -> dict:
    import pyspark.sql.functions as F

    base = f"{WORK}/n{n}"
    shutil.rmtree(base, ignore_errors=True)
    df = _dataset(spark, n).repartition(shards)

    out: dict = {"rows": n, "shards": shards}

    t0 = time.time()
    df.write.format("sfl").option("path", f"{base}/sfl").mode("overwrite").save()
    out["write_sfl_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    df.write.mode("overwrite").parquet(f"{base}/parquet")
    out["write_parquet_s"] = round(time.time() - t0, 2)

    def _scan(reader_df) -> tuple[float, int]:
        t0 = time.time()
        row = reader_df.agg(
            F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")
        ).collect()[0]
        return round(time.time() - t0, 2), row["c"]

    row_df = spark.read.format("sfl").option("path", f"{base}/sfl").load()
    out["read_row_s"], c1 = _scan(row_df)
    arrow_df = (
        spark.read.format("sfl")
        .option("path", f"{base}/sfl")
        .option("arrow", "true")
        .load()
    )
    out["read_arrow_s"], c2 = _scan(arrow_df)
    out["read_parquet_s"], c3 = _scan(spark.read.parquet(f"{base}/parquet"))
    assert c1 == c2 == c3 == n, (c1, c2, c3, n)
    shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,16,64")
    ap.add_argument("--base-rows", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    SparkSession.builder.config("spark.driver.memory", "20g").getOrCreate()
    from sparkflow_spark.session import build_session
    from sparkflow_spark.sources_python import register_sfl

    spark = build_session(app_name="sfl_probe")
    register_sfl(spark)

    scales = [int(s) for s in args.scales.split(",")]
    # warm-up pass (discarded): python-worker spin-up + first-plan
    # Janino/codegen costs otherwise inflate the ×1 row and deflate the
    # per-row ratios of every larger scale
    probe_scale(spark, args.base_rows, shards=32)
    rows = []
    for m in scales:
        n = args.base_rows * m
        r = probe_scale(spark, n, shards=32)
        r["scale"] = m
        print(json.dumps(r))
        rows.append(r)
    base = rows[0]
    print("\n| scale | rows | write sfl (s) | read row (s) | read arrow (s) | read parquet (s) | arrow/row | sfl-row/parquet | per-row vs x1 (row path) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        m = r["scale"]
        per_row = (r["read_row_s"] / max(base["read_row_s"], 1e-9)) / m
        print(
            f"| x{m} | {r['rows']:,} | {r['write_sfl_s']} | {r['read_row_s']} "
            f"| {r['read_arrow_s']} | {r['read_parquet_s']} "
            f"| {r['read_arrow_s'] / max(r['read_row_s'], 1e-9):.2f} "
            f"| {r['read_row_s'] / max(r['read_parquet_s'], 1e-9):.1f}x "
            f"| {per_row:.2f}x |"
        )
    shutil.rmtree(WORK, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
