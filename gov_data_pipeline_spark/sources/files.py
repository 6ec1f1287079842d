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
    shuffle_by: str | None = None,
    shuffle_seed: int | None = None,
) -> None:
    """JSONL sink — the training-corpus interchange format (one JSON
    object per line, optionally gzip/zstd-compressed shards).

    ``shards`` pins the output file count: trainers that stream shards
    round-robin want a known, balanced shard layout, not whatever
    partition count the upstream plan happened to end with. The
    repartition is a round-robin exchange — one extra shuffle, paid
    only when the caller asks for a specific layout. ``partition_by``
    composes (e.g. partition by language, shard within).

    ``shuffle_by`` + ``shuffle_seed`` (both or neither) switch the
    layout to a SEEDED DETERMINISTIC GLOBAL SHUFFLE — the
    training-export contract (r12): round-robin ``repartition`` gives
    balanced shards but a run-dependent assignment, so two exports of
    the same corpus feed a trainer different sequences. Here both the
    shard AND the within-shard order are pure functions of
    (seed, id): key = md5(seed ':' id), shard = int(key[:8]) mod
    ``shards``, order = (key asc, id asc) — re-running the export, on
    any cluster, any partitioning, reproduces every shard file's exact
    line sequence (q196 oracle + rerun-stability test). Layout:
    ``path/shard=K/part-*`` — one data file per shard directory (each
    shard's rows land in exactly one task), written in key order.
    Requires ``shards``; incompatible with ``partition_by`` (the shard
    IS the partition dir); the frame must not already have a ``shard``
    column.

    Scale shape: one hash exchange on the shard id + a per-partition
    sort — exactly the two costs a reproducible global shuffle
    requires; nothing touches the driver. Size ``shards`` so one shard
    (corpus/shards) fits a single task comfortably (0.5-1 GB
    uncompressed); the md5 key spreads ids uniformly, so shard skew is
    binomial-tight regardless of id distribution."""
    from pyspark.sql import functions as F

    if shards is not None and shards < 1:
        raise ValueError(f"write_jsonl: shards must be >= 1, got {shards}")
    if (shuffle_by is None) != (shuffle_seed is None):
        raise ValueError(
            "write_jsonl: shuffle_by and shuffle_seed go together"
        )
    if shuffle_by is not None:
        if shards is None:
            raise ValueError("write_jsonl: seeded shuffle requires shards")
        if partition_by:
            raise ValueError(
                "write_jsonl: seeded shuffle is incompatible with "
                "partition_by (the shard is the partition directory)"
            )
        for taken in ("shard", "__key"):
            if taken in df.columns:
                raise ValueError(
                    f"write_jsonl: seeded shuffle computes a {taken!r} "
                    "column internally; rename the existing one"
                )
        key = F.md5(
            F.concat_ws(
                ":",
                F.lit(str(int(shuffle_seed))),
                F.col(shuffle_by).cast("string"),
            )
        )
        shard = F.pmod(
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long"),
            F.lit(shards),
        ).cast("int")
        out = (
            df.withColumn("__key", key)
            .withColumn("shard", shard)
            .repartition(shards, F.col("shard"))
            .sortWithinPartitions(
                "shard", "__key", F.col(shuffle_by).cast("string")
            )
            .drop("__key")
        )
        writer = out.write.mode(mode)
        if compression:
            writer = writer.option("compression", compression)
        writer.partitionBy("shard").json(path)
        return
    out = df.repartition(shards) if shards is not None else df
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
