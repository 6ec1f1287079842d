"""Fixture-table catalog.

The driver fixtures (TESTDATA.md) are one parquet file per table. This
module is the single place that knows the table names and loads them; the
rest of the engine takes DataFrames.

Design note: these are plain ``spark.read.parquet`` scans so Catalyst
keeps full pushdown freedom — predicate pushdown, column pruning and
(when the layout has partitions) partition pruning all reach the parquet
reader. At 100 TB the same call reads a partitioned directory tree; no
code change is needed because nothing here materializes or caches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables a planner should broadcast in star joins.
DIM_TABLES = ("region", "nation", "supplier", "part", "customer")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing physical-type quirks.

    ``events.parquet`` has shipped with ``ts`` as either TIMESTAMP(NANOS)
    (which Spark's parquet reader has no type for — we read it as
    epoch-nanos long via the legacy conf and truncate to microseconds,
    bit-identical to DuckDB's nanos→micros truncation) or as plain
    TIMESTAMP(MICROS). The conversion is gated on the *read* schema so
    either fixture vintage works: only a LongType ``ts`` is converted;
    a real timestamp column passes through untouched.
    """
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        except Exception:
            # Only the TIMESTAMP(NANOS) vintage needs the legacy conf;
            # setting it unconditionally would silently change how every
            # LATER parquet read in the shared session handles nanos
            # columns (they'd load as epoch-nanos longs instead of
            # erroring) — so it is enabled only after a read actually
            # fails without it.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # Session-tz-agnostic: NTZ wall-clock == the naive timestamps
            # DuckDB reads; cast so downstream tz-aware ops behave the
            # same as the historical timestamp_micros() output under UTC.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table under ``sf_dir`` as a DataFrame."""
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for ``spark.sql``."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
