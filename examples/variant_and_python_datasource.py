#!/usr/bin/env python
"""Tour of the round-11 surfaces: VARIANT semi-structured queries and
the ``sfl`` Python Data Source, end to end on the sf0.001 fixtures.

Run: python examples/variant_and_python_datasource.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from sparkflow_spark.catalog import cached_table
from sparkflow_spark.session import build_session
from sparkflow_spark.sources_python import register_sfl


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(app_name="variant_sfl_example")

    # -- VARIANT: parse once, extract many ------------------------------
    ev = cached_table(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    extracted = v.selectExpr(
        "event_id",
        "variant_get(v, '$.k', 'int') AS k",
        "try_variant_get(v, '$.missing', 'int') AS miss",  # NULL, no throw
        "schema_of_variant(v) AS sch",
    )
    print("VARIANT extraction over events.props:")
    extracted.show(5, truncate=False)

    # coercion rules in one line each
    row = spark.sql(
        """SELECT try_variant_get(parse_json('{"p": 12.9}'), '$.p', 'int') AS trunc,
                  try_variant_get(parse_json('{"s": "x"}'), '$.s', 'int') AS bad,
                  try_parse_json('{oops') AS malformed"""
    ).collect()[0]
    print(f"decimal→int truncates: {row['trunc']}; bad cast → {row['bad']}; "
          f"malformed via try_parse_json → {row['malformed']}")

    # -- Python Data Source: write, read, push down, stream -------------
    register_sfl(spark)
    d = tempfile.mkdtemp() + "/events_sfl"
    ev.select("event_id", "user_id", "event_type", "value", "ts").repartition(
        4
    ).write.format("sfl").option("path", d).mode("overwrite").save()
    print(f"\nwrote sfl dataset: {sorted(os.listdir(d))}")

    back = spark.read.format("sfl").option("path", d).load()
    print(f"read back {back.count()} rows in {back.rdd.getNumPartitions()} "
          "partitions (one per shard)")

    pushed = back.filter((F.col("event_type") == "click") & (F.col("value") > 50))
    print(f"pushed-down filter matched {pushed.count()} rows "
          "(eq/gt consumed inside the source — no post-scan Filter)")

    sdf = (
        spark.readStream.format("sfl").option("path", d).schema(back.schema).load()
    )
    from sparkflow_spark.streaming.windows import run_stream_to_memory

    agg = run_stream_to_memory(
        sdf.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")), "complete"
    )
    print("streaming read of the same dataset (counts by type):")
    agg.orderBy("event_type").show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
