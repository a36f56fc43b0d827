"""ML pipeline query surface — filled by sparkflow_spark.ml (M2)."""
