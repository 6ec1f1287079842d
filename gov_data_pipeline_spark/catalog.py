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

    ``events.parquet`` stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    parquet reader has no type for. We read it as epoch-nanos long
    (legacy conf, runtime-settable) and truncate to microseconds with
    integer division — bit-identical to how DuckDB's reader truncates
    nanos to its micros timestamp.
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
