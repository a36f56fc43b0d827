"""Streaming sinks beyond the memory/console toys.

``foreachBatch`` is Structured Streaming's escape hatch to any batch
writer; the discipline that makes it production-grade is IDEMPOTENCE —
a micro-batch can be replayed after a failure, so the write must be
exactly-once under retries. The parquet sink below gets that by
partitioning the output by ``batch_id`` and using dynamic partition
overwrite: a replayed batch overwrites its own partition instead of
appending duplicates. (The same pattern carries to MERGE-capable table
formats — Delta/Iceberg — where batch_id becomes a dedup key.)
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def stream_to_partitioned_parquet(
    sdf: DataFrame,
    path: str,
    output_mode: str = "append",
    partition_cols: list[str] | None = None,
) -> None:
    """Run a streaming DataFrame to completion (AvailableNow) into a
    parquet directory, exactly-once under micro-batch replay.

    Layout: ``path/batch_id=N/[partition_cols...]``. Each micro-batch
    writes with dynamic partition overwrite scoped to its own batch_id
    partition — a retried batch replaces, never duplicates. Downstream
    readers see one directory; batch_id behaves like any partition
    column (prunable, droppable).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id", *(partition_cols or []))
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", f"/tmp/sparkflow_sink_ckpt/{uuid.uuid4().hex[:12]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
