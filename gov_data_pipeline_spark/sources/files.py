"""File sources/sinks (SURVEY T1/T3 — the generalization of the
reference's single-workbook ingest, ``handlers/belarus.py:106-110``).

These are deliberately thin wrappers over ``spark.read``/``df.write``:
the value is the defaults — schema-on-read is explicit (inference is a
correctness trap on messy data), writes are partitioned, and nothing
here ever materializes on the driver. At 100 TB a scan is a directory
tree of partitioned files and these calls work unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is None:
        # inference needs an extra pass over the data; accept for ad-hoc
        # use but prefer explicit schemas in pipelines.
        reader = reader.option("inferSchema", "true")
    else:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options: str
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> None:
    """Partitioned parquet sink. ``partition_by`` low-cardinality
    columns (date, source) gives downstream readers partition pruning
    for free — the single highest-leverage layout decision at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet (Spark's
    native vectorized ORC reader), for lakes standardized on ORC."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Line-oriented (or whole-file, ``whole=True``) text scan — the
    raw-corpus entry point: one string column ``value``, one row per
    line/file; pair with the text-stats and dedup operators."""
    return spark.read.option("wholetext", str(whole).lower()).text(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "error",
    shards: int | None = None,
    compression: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """JSONL sink — the training-corpus interchange format (one JSON
    object per line, optionally gzip/zstd-compressed shards).

    ``shards`` pins the output file count: trainers that stream shards
    round-robin want a known, balanced shard layout, not whatever
    partition count the upstream plan happened to end with. The
    repartition is a round-robin exchange — one extra shuffle, paid
    only when the caller asks for a specific layout. ``partition_by``
    composes (e.g. partition by language, shard within)."""
    if shards is not None and shards < 1:
        raise ValueError(f"write_jsonl: shards must be >= 1, got {shards}")
    out = df.repartition(shards) if shards is not None else df
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
