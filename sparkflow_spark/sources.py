"""Sources & sinks with scale discipline.

The reference's source surface is CSV-with-inferSchema and parquet
(reference examples/simple_dnn.py:31, README.md:198); its only sink is
ML artifacts. This module declares the engine's data IO surface:

- readers: explicit schema strongly preferred — ``inferSchema`` is a
  full extra pass over the data (fatal at 100 TB); kept available for
  parity with the reference's examples.
- writers: partitioned parquet (partition pruning for every downstream
  reader) and bucketed tables (shuffle-free co-located joins on the
  bucket key — the classic pre-shuffle investment for fact-fact joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T

from sparkflow_spark.session import ensure_runtime_configs


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """CSV scan. Pass a schema; ``infer_schema=True`` (the reference's
    default habit) costs a full extra read of the files."""
    ensure_runtime_configs(spark)
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    ensure_runtime_configs(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    ensure_runtime_configs(spark)
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning story as parquet (both are
    columnar with min/max stats; .explain shows PushedFilters)."""
    ensure_runtime_configs(spark)
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_text(spark: SparkSession, path: str, whole_text: bool = False) -> DataFrame:
    """Line-oriented text source → (value: string), or whole-file when
    ``whole_text`` — the raw-document ingest path of an LLM data
    pipeline (one doc per line/file, downstream ops are the textops/
    dedup operators)."""
    ensure_runtime_configs(spark)
    return spark.read.text(path, wholetext=whole_text)


def read_binary_files(
    spark: SparkSession, path: str, path_glob: str | None = None
) -> DataFrame:
    """``binaryFile`` source → (path, modificationTime, length,
    content: binary) — the multimodal ingest path: images/audio/video
    land as opaque binary columns with typed metadata, feeding
    ``sparkflow_spark.multimodal``'s mapInPandas decoders. Filters on
    path/length push down; content bytes are only read for surviving
    rows."""
    ensure_runtime_configs(spark)
    reader = spark.read.format("binaryFile")
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink: downstream filters on the partition
    columns become directory pruning (zero data read for pruned
    partitions). ``max_records_per_file`` guards against the
    small-files *and* giant-files failure modes."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on the bucket key skip
    the shuffle entirely (both sides pre-partitioned on disk). This is
    the 'pay the shuffle once at write time' strategy for 100 TB fact
    tables that are joined repeatedly on the same key."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)
