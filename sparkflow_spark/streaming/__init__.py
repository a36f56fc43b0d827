"""Structured Streaming surface (SURVEY.md §7 M5 / §2c Q37-Q39).

The reference has no streaming (SURVEY.md §1); this module adds the
declared stream operators Spark-first: file-source ``readStream`` over
the events fixture, event-time windows (tumbling / sliding / session)
with watermarks, and custom per-key state via ``applyInPandasWithState``.

Correctness contract: every streaming aggregation here has a *batch
equivalence* — run with ``Trigger.AvailableNow`` over a static source,
the final result must equal the batch query over the same data. That is
exactly what the t2 oracles check.

At 100 TB-a-day scale the same topology holds: the file source becomes
Kafka/object-store listing, ``availableNow`` becomes a continuous
trigger, and state lives in the checkpointed state store (RocksDB);
watermarks bound state size — none of the operators below keep unbounded
per-key state.
"""

from sparkflow_spark.streaming.windows import (
    stream_events,
    run_stream_to_memory,
    streaming_session,
    tumbling_counts,
    sliding_counts,
    session_counts_batch,
)
from sparkflow_spark.streaming.sinks import stream_to_partitioned_parquet
from sparkflow_spark.streaming.stateful import running_user_counts

__all__ = [
    "stream_events",
    "run_stream_to_memory",
    "streaming_session",
    "tumbling_counts",
    "sliding_counts",
    "session_counts_batch",
    "running_user_counts",
    "stream_to_partitioned_parquet",
]
