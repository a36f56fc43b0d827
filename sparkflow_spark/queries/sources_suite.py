"""Custom-source query surface — the Python Data Source API end-to-end
(r10 verdict ask #6). The t2 entry below writes a fixture projection
through the registered ``sfl`` format and reads it back through the
same format's planner path (manifest → one InputPartition per shard),
so the oracle hash-check covers the WHOLE custom-source pipeline:
schema-directed field codec, task-shard writer, atomic manifest commit,
partition planning, and the per-shard parse."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from sparkflow_spark.queries import register


@register(
    "src_sfl_roundtrip",
    oracle="""
        SELECT event_id, user_id, event_type, value,
               CAST(ts AS TIMESTAMP) AS ts, props
        FROM events ORDER BY event_id
    """,
    tags=("sources", "python-datasource", "large-output"),
)
def src_sfl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Write the events table through the ``sfl`` Python Data Source
    (delimited log + atomic manifest commit), read it back through the
    same source, and hash-match the original rows — doubles (repr
    shortest-round-trip), timestamps (ISO-8601 µs) and strings
    (escaped) must all survive the text codec bit-exactly for the hash
    to agree. The artifact lives under the session warehouse keyed by
    sf and is written once per session (manifest presence check — no
    collect, the read stays lazy); 4 shards → 4 InputPartitions,
    asserted by t1."""
    from sparkflow_spark.catalog import cached_table, warehouse_subdir
    from sparkflow_spark.sources_python import register_sfl

    register_sfl(spark)
    d = warehouse_subdir(spark, "sfl_events", key=sf)
    if not os.path.exists(os.path.join(d, "_manifest.json")):
        ev = cached_table(spark, sf, "events").select(
            "event_id", "user_id", "event_type", "value", "ts", "props"
        )
        ev.repartition(4).write.format("sfl").option("path", d).mode(
            "overwrite"
        ).save()
    return (
        spark.read.format("sfl")
        .option("path", d)
        .load()
        .select("event_id", "user_id", "event_type", "value", "ts", "props")
    )
