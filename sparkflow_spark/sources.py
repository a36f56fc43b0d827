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

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
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


def read_parquet_robust(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Parquet scan that SURVIVES corrupt files instead of killing the
    job — at 100 TB some files WILL have truncated footers (killed
    writers, partial uploads) and the default FAILFAST behavior turns
    one bad object into a dead billion-row job. Sets the per-read
    ``ignoreCorruptFiles`` option (scoped to this scan, not the
    session-wide ``spark.sql.files.ignoreCorruptFiles``), so corrupt
    files are skipped with a warning while every healthy file is read.

    Pass ``schema`` when the FIRST file listed could itself be the
    corrupt one: schema inference reads one footer, and a corrupt
    footer there fails before the ignore option can help. Dropped files
    are silent data loss by design — pair with a file-count/row-count
    audit (``operators.table_checksum``) when completeness must be
    proved, or quarantine-and-reconcile like read_json_with_quarantine.
    """
    ensure_runtime_configs(spark)
    reader = spark.read.option("ignoreCorruptFiles", "true")
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        reader = reader.schema(schema)
    return reader.parquet(path)


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
    coalesce_partitions: bool = True,
) -> None:
    """Partitioned parquet sink: downstream filters on the partition
    columns become directory pruning (zero data read for pruned
    partitions).

    ``coalesce_partitions`` (default ON) repartitions on the partition
    columns first, so each directory gets ONE file instead of one per
    (directory × input-partition). The raw form's file explosion is
    not just ugly — sub-``openCostInBytes`` files each become their
    own scan task (maxSplitBytes floors at the open cost), measured at
    32,000 tasks ≈ 350 s/query on the IVF cells table (SCALE.md
    round-7h). The trade: each partition value is written by a single
    task — for few, huge partition values set it False (keep write
    parallelism) and size files with ``max_records_per_file``, which
    also splits giants in the coalesced form."""
    if coalesce_partitions:
        df = df.repartition(*[F.col(c) for c in partition_by])
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


def zorder_value(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Z-order (Morton) key over ``cols`` as a pure Catalyst expression.

    Each column is rank-normalized into a ``bits``-wide integer bucket
    via ``width_bucket`` between its global min/max (one cheap agg,
    collected once at plan time — two scalars per column), then the
    bucket bits are interleaved with plan-time shift/OR chains. No UDF,
    no window: the whole key codegens into the write stage.

    min/max bucketing (vs rank/ntile) keeps the computation one-pass
    and shuffle-free; heavily skewed columns bucket unevenly, which
    loosens (never breaks) the clustering — for those, pre-transform
    the column (e.g. log) before calling.
    """
    if not (1 <= len(cols) <= 4):
        raise ValueError("zorder_value supports 1-4 columns")
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds a long")
    # one tiny job: global min/max per column (column pruning makes this
    # a stats-only parquet read where footers allow)
    aggs = []
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [F.min(d).alias(f"{c}__mn"), F.max(d).alias(f"{c}__mx")]
    row = df.agg(*aggs).first()
    nb = 1 << bits
    buckets = []
    for c in cols:
        mn, mx = row[f"{c}__mn"], row[f"{c}__mx"]
        if mn is None or mx is None or mx <= mn:
            buckets.append(F.lit(0).cast("long"))
            continue
        # width_bucket → 1..nb+1 (nb+1 only at exactly mx); clamp, 0-base
        b = F.width_bucket(F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(nb))
        buckets.append(
            F.least(F.coalesce(b, F.lit(1)), F.lit(nb)).cast("long") - 1
        )
    # interleave: output bit (i*len(cols)+j) = bit i of buckets[j]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet sink: rows are range-partitioned and
    sorted by their Morton key, so every output file covers a compact
    HYPER-RECTANGLE of the ``cols`` space and parquet footer min/max
    stats become selective on EVERY clustered column at once.

    This is the multi-dimensional analogue of ``write_partitioned``:
    a filter on ANY subset of ``cols`` prunes files/row-groups at scan
    time (linear sort helps only the leading column). The pay-once cost
    is one range exchange (sampling + shuffle) at write time — at
    100 TB that is the same bill a plain ``orderBy`` write pays; the
    clustering quality is what changes. tests/test_zorder.py measures
    the file-level pruning factor vs an unclustered write.
    """
    z = zorder_value(df, cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """XML scan (Spark 4 built-in StAX source). Same schema discipline
    as CSV: pass one, or pay a sampling pass for inference. Row
    boundaries split on ``row_tag``, so files parallelize like any
    text-based source."""
    ensure_runtime_configs(spark)
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (one file per partition, rows under ``root_tag``)."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ⌈rows / target⌉ similarly-sized files; returns the output file
    count. The small-files problem is the canonical table-maintenance
    job at scale (every downstream scan pays per-file open/footer
    costs, and 100 TB tables accrete micro-files from streaming sinks);
    this is the plain-parquet version of OPTIMIZE/rewrite_data_files.

    One count (metadata-cheap on parquet) + one repartition(n) write.
    Content equality under compaction is checkable with
    operators.table_checksum — the order-independent checksum is
    invariant to the rewrite (pinned in tests).
    """
    df = spark.read.parquet(src)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(dest)
    # count via Spark's FS layer, not os.listdir — dest may be
    # hdfs:///s3a:// where a local listing would raise after the
    # rewrite already succeeded
    return len(spark.read.parquet(dest).inputFiles())


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
) -> None:
    """Selective partition overwrite (idempotent backfill): rewrite ONLY
    the partitions present in ``df``, leaving every other partition
    untouched — Spark's dynamic partitionOverwriteMode, scoped to this
    write instead of mutating session config.

    The backfill primitive at scale: re-deriving one bad day of a
    date-partitioned 100 TB table writes that day's directories and
    nothing else, and re-running the same backfill converges to the
    same state (idempotent). STATIC mode (the default) would silently
    DELETE every partition not present in the incoming frame — the
    classic destroyed-table incident this helper exists to prevent.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_json_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Resilient JSON ingest → (clean_rows, quarantine): PERMISSIVE
    parsing with the corrupt raw line captured in a rescue column;
    malformed records land in the quarantine frame (raw text + file)
    instead of failing the job or silently disappearing.

    The dead-letter pattern every 100 TB ingest needs: FAILFAST kills a
    billion-row job on one bad line, DROPMALFORMED silently loses data
    — this keeps the job running AND the evidence queryable. The split
    is one predicate on the rescue column; both frames share the single
    scan until the filter, so quarantining costs nothing extra.
    """
    ensure_runtime_configs(spark)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    # COPY the field list: StructType.add mutates and returns the same
    # object, which would permanently graft _corrupt_record onto the
    # caller's schema (and duplicate it on a second call)
    rescued = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(rescued)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .withColumn("_source_file", F.input_file_name())
    )
    # Spark forbids queries that reference ONLY the corrupt column of a
    # raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the supported
    # pattern is caching the parsed frame, which also means the two
    # returned frames share ONE parse of the input. Caller unpersists
    # (or lets the ContextCleaner reclaim it) when done.
    df = df.cache()
    clean = df.where(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record", "_source_file"
    )
    quarantine = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw"), F.col("_source_file").alias("source_file")
    )
    return clean, quarantine
