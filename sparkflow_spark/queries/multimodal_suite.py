"""Multimodal column query surface — filled by sparkflow_spark.multimodal (M3)."""
