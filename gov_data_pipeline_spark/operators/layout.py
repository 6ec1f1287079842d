"""Storage-layout operators: Z-order (Morton) clustering for
multi-dimensional file pruning (engine extension — the lakehouse
technique Spark itself doesn't ship).

A table range-partitioned and sorted on ONE column prunes scans
filtered on that column, but a filter on any OTHER column touches
every file. Interleaving the bits of two (or more) columns into a
Morton key and range-partitioning on THAT gives every file a tight
min/max envelope in all interleaved dimensions at once, so parquet
footer stats prune files for filters on any of them.

Fully native: the key is a codegen'd bit-interleave expression — no
UDF, no shuffle beyond the range partitioning the write needs anyway.
``tests/test_storage_layout.py`` verifies the pruning claim against
actual parquet footers (pyarrow), not just plan text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key_col(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of two
    non-negative integer columns (a in even positions, b in odd).

    ``bits=16`` covers values up to 65535 per dimension — bucket or
    quantile-rank wider domains first (the standard practice: z-order
    ranks, not raw values, so skew doesn't collapse the curve).
    """
    def bit(col: Column, i: int, pos: int) -> Column:
        return F.call_function(
            "shiftleft",
            F.call_function("shiftright", col.cast("long"), F.lit(i)).bitwiseAND(
                F.lit(1)
            ),
            F.lit(pos),
        )

    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(bit(a, i, 2 * i)).bitwiseOR(bit(b, i, 2 * i + 1))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
    mode: str = "error",
) -> None:
    """Write parquet clustered on the Morton curve of (col_a, col_b):
    range-partition by the z-key into ``n_files`` buckets and sort
    within partitions, so each output file covers a compact 2-D tile
    and its footer min/max stats prune on either column."""
    keyed = df.withColumn("__z", zorder_key_col(F.col(col_a), F.col(col_b), bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "error",
) -> None:
    """Persist ``df`` hash-bucketed (and per-file sorted) on
    ``bucket_cols`` — Spark's pre-shuffled storage layout.

    Every row lands in ``hash(bucket_cols) % num_buckets``; a later
    join or aggregation on the bucket columns between two tables
    bucketed the same way needs NO exchange — the shuffle was paid
    once at write time, then amortized over every downstream query.
    That is the canonical 100 TB fact⋈fact strategy: co-locate at
    ingest, never re-shuffle the big table again. ``sort_cols``
    additionally pre-sorts each bucket file so sort-merge joins skip
    their sort too.

    Bucketing metadata lives in the table catalog, so the write goes
    through ``saveAsTable`` (``path`` makes it an external table —
    the data survives the session even with an in-memory catalog).
    ``mode`` defaults to ``error`` like every other sink in the
    package — pass ``overwrite`` explicitly to replace a table.
    """
    # Pre-partition on the bucket hash so each task owns whole buckets:
    # one file per bucket instead of (tasks x buckets) shards — and
    # only single-file buckets let the reader trust the sort order.
    writer = (
        df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def compact_parquet(
    spark,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_file_bytes`` each. Returns the output file count.

    The streaming ingest sinks (and any frequent-append producer)
    accumulate one small file per micro-batch; at 100 TB that turns
    every later scan into a listing + footer-read storm and starves
    the scheduler with sub-split tasks. Compaction is the maintenance
    pass that restores scan health: input size comes from the file
    listing (driver metadata only, no data read), the rewrite is one
    round-robin repartition to ceil(bytes/target) partitions, and
    ``sort_within_by`` optionally restores a clustering order
    (sortWithinPartitions — no extra shuffle) so min/max footer pruning
    keeps working after compaction.

    The rewrite lands in ``dest_path`` (write-then-swap is the caller's
    atomic publish step — object stores have no atomic directory
    rename, so the swap belongs to the catalog/manifest layer, not
    here).

    Hive-partitioned sources MUST pass ``partition_by`` with their
    partition columns: reading flattens the directory scheme into data
    columns, and without re-partitioning the write the compacted copy
    would silently lose partition pruning (and partition-value types
    can change under inference — pair with an explicit read schema in
    the catalog when that matters).
    """
    from pyspark.sql.functions import col

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(hconf)
    it = fs.listFiles(p, True)
    total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet") or name.startswith("part-"):
            total += f.getLen()
    n_files = max(1, -(-total // target_file_bytes))  # ceil

    df = spark.read.parquet(src_path).repartition(n_files)
    if sort_within_by:
        df = df.sortWithinPartitions(*[col(c) for c in sort_within_by])
    writer = df.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest_path)
    # Report the files actually written (empty round-robin partitions
    # produce no file, so this can be < the computed partition count).
    dp = jvm.org.apache.hadoop.fs.Path(dest_path)
    dit = dp.getFileSystem(hconf).listFiles(dp, True)
    written = 0
    while dit.hasNext():
        if dit.next().getPath().getName().startswith("part-"):
            written += 1
    return written
