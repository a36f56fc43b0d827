"""Streaming query surface — filled by sparkflow_spark.streaming (M4)."""
