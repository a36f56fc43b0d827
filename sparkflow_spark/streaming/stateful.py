"""Custom stateful streaming via ``applyInPandasWithState`` (Q39).

The canonical "running per-key aggregate with explicit state" operator:
per user_id, keep a count in GroupState and emit the updated total each
micro-batch. With AvailableNow over a static source the final emission
per key equals the batch ``GROUP BY user_id`` count — the t2 oracle.

State is O(1) per key (a single long), so at scale the state store stays
bounded by key cardinality, not event volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sparkflow_spark.streaming.windows import run_stream_to_memory, stream_events

_OUT_SCHEMA = T.StructType(
    [T.StructField("user_id", T.LongType()), T.StructField("c", T.LongType())]
)
_STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])


def _update_count(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (count,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        count += len(pdf)
    state.update((count,))
    yield pd.DataFrame({"user_id": [key[0]], "c": [count]})


def running_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user event counts with explicit GroupState."""
    sdf = stream_events(spark, sf_dir, watermark=None)
    counts = sdf.groupBy("user_id").applyInPandasWithState(
        _update_count,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_stream_to_memory(counts, "update")
    # one emission per key per micro-batch; keep the final (max) total
    import pyspark.sql.functions as F

    return out.groupBy("user_id").agg(F.max("c").alias("c")).orderBy("user_id")
