"""sparkflow_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capabilities of lifeomic/sparkflow (reference
surveyed in SURVEY.md) expressed idiomatically on Spark DataFrame / SQL /
Catalyst / MLlib / Structured Streaming, extended with the relational
operator surface declared in SURVEY.md §2c and large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns).

Design stance (SURVEY.md §7):
- DataFrame-first; no RDD escapes. Catalyst keeps control (pushdown,
  pruning, join selection, AQE) around every operator.
- Every Python-touching operator declares an explicit output schema and
  moves data over Arrow (``pandas_udf`` / ``mapInPandas`` /
  ``applyInPandas``) — never row-at-a-time pickling.
- No driver-side data collection: aggregates stay distributed, small
  dimensions are broadcast, model weights (O(params), not O(rows)) are
  the only driver-held state.
"""

from sparkflow_spark.session import build_session, ensure_runtime_configs
from sparkflow_spark.catalog import TABLE_NAMES, load_tables, register_views
from sparkflow_spark.engine import Engine

__all__ = [
    "build_session",
    "ensure_runtime_configs",
    "TABLE_NAMES",
    "load_tables",
    "register_views",
    "Engine",
]

__version__ = "0.1.0"
