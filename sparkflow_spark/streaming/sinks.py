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

import os

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def stream_to_partitioned_parquet(
    sdf: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    checkpoint_dir: str | None = None,
) -> None:
    """Run a streaming DataFrame to completion (AvailableNow) into a
    parquet directory, exactly-once under micro-batch replay.

    Layout: ``path/batch_id=N/[partition_cols...]``. Each micro-batch
    writes with dynamic partition overwrite scoped to its own batch_id
    partition — a retried batch replaces, never duplicates. Downstream
    readers see one directory; batch_id behaves like any partition
    column (prunable, droppable).

    Append-mode only by design: under ``complete``/``update`` every
    batch re-emits rows for keys earlier batches already wrote, and the
    batch_id layout would retain the stale copies — a MERGE-capable
    table format keyed on the group columns is the right sink there, so
    this function pins ``append`` instead of corrupting silently.

    The checkpoint is STABLE per output path and lives INSIDE it
    (``path/_checkpoint``, override with ``checkpoint_dir``):
    replay-idempotence only holds when a restarted run resumes the same
    offset log and batch ids — a fresh random checkpoint would re-batch
    the input and leave any partially written old partition in place
    (round-3 review finding). Co-locating it couples the two lifetimes:
    deleting the output also resets the offset log (a /tmp checkpoint
    would survive and make the rerun a silent no-op), and losing the
    checkpoint alone can't strand stale batches. Underscore-prefixed
    dirs are invisible to parquet readers, so downstream scans are
    unaffected.
    """
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(path, "_checkpoint")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            # writer-scoped option, not a session-conf set-then-restore
            # (that pattern races with concurrent writers — the same
            # reasoning as streaming_session's conf isolation)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", *(partition_cols or []))
            .parquet(path)
        )

    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
