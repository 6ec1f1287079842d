"""Storage-layout scale patterns: partitioned writes give partition
pruning; bucketed tables give shuffle-free co-located joins. Both are
layout decisions that dominate performance at 100 TB — these tests pin
that the engine's write paths actually produce them.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gov_data_pipeline_spark.catalog import read_table
from gov_data_pipeline_spark.sources import write_parquet


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestPartitionPruning:
    def test_partitioned_write_prunes_on_read(self, spark, sf_dir):
        d = tempfile.mkdtemp(prefix="part_")
        try:
            events = read_table(spark, sf_dir, "events")
            write_parquet(events, f"{d}/events", mode="overwrite", partition_by=["event_type"])
            # one directory per event_type
            dirs = {p for p in os.listdir(f"{d}/events") if p.startswith("event_type=")}
            assert len(dirs) == 5
            back = spark.read.parquet(f"{d}/events").filter(F.col("event_type") == "click")
            plan = _formatted(back)
            # the filter became a partition filter on the scan — only the
            # click directory is read, no row-level filtering needed
            assert "PartitionFilters" in plan
            assert "event_type" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
            assert back.count() == events.filter(F.col("event_type") == "click").count()
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestBucketedJoin:
    def test_bucketed_tables_join_without_exchange(self, spark, sf_dir):
        """bucketBy co-locates both join sides on the key: the join plan
        has no Exchange (shuffle) on either scan — at 100 TB this is the
        difference between a full-network shuffle and a local merge."""
        # warehouse dir is a static conf; conftest points it at a tmp dir
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        try:
            orders = read_table(spark, sf_dir, "orders")
            li = read_table(spark, sf_dir, "lineitem")
            (
                orders.write.bucketBy(8, "o_orderkey")
                .sortBy("o_orderkey")
                .mode("overwrite")
                .saveAsTable("b_orders")
            )
            (
                li.write.bucketBy(8, "l_orderkey")
                .sortBy("l_orderkey")
                .mode("overwrite")
                .saveAsTable("b_lineitem")
            )
            # tiny SF would go broadcast; force the sort-merge path the
            # fixture is standing in for at scale
            prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:

                def agg_join(left, right):
                    return (
                        left.join(
                            right, F.col("l_orderkey") == F.col("o_orderkey")
                        )
                        .groupBy("o_orderstatus")
                        .agg(F.count(F.lit(1)).alias("n"))
                    )

                bucketed = agg_join(
                    spark.table("b_lineitem"), spark.table("b_orders")
                )
                plain = agg_join(li, orders)
                n_ex_bucketed = _formatted(bucketed).count("+- Exchange")
                n_ex_plain = _formatted(plain).count("+- Exchange")
                # bucketing removes exactly the two join-input shuffles;
                # the aggregation exchange remains in both plans
                assert "SortMergeJoin" in _formatted(bucketed)
                assert n_ex_bucketed == n_ex_plain - 2, (n_ex_bucketed, n_ex_plain)
                got = {r["o_orderstatus"]: r["n"] for r in bucketed.collect()}
                want = {r["o_orderstatus"]: r["n"] for r in plain.collect()}
                assert got == want
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")
            shutil.rmtree("spark-warehouse", ignore_errors=True)


class TestZOrder:
    def test_morton_key_interleaves(self, spark):
        from gov_data_pipeline_spark.operators.layout import zorder_key_col
        import pyspark.sql.functions as F

        df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a int, b int")
        got = {
            (r["a"], r["b"]): r["z"]
            for r in df.select("a", "b", zorder_key_col(F.col("a"), F.col("b")).alias("z")).collect()
        }

        def morton(a, b):
            z = 0
            for i in range(16):
                z |= ((a >> i) & 1) << (2 * i)
                z |= ((b >> i) & 1) << (2 * i + 1)
            return z

        for (a, b), z in got.items():
            assert z == morton(a, b), (a, b)

    def test_zorder_layout_prunes_both_dims(self, spark, tmp_path):
        """Against actual parquet footers: a z-ordered layout keeps
        tight min/max envelopes on BOTH columns, so a filter on the
        non-sort dimension prunes most files — a single-column-sorted
        layout cannot prune it at all."""
        import pyarrow.parquet as pq
        import os

        from gov_data_pipeline_spark.operators.layout import write_zordered

        rows = [(x, y) for x in range(0, 256, 4) for y in range(0, 256, 4)]
        df = spark.createDataFrame(rows, "x int, y int")

        z_path = str(tmp_path / "zordered")
        lin_path = str(tmp_path / "linear")
        write_zordered(df, z_path, "x", "y", n_files=16)
        df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lin_path)

        def files_touched(path, col, lo, hi):
            touched = 0
            for root, _, files in os.walk(path):
                for f in files:
                    if not f.endswith(".parquet"):
                        continue
                    md = pq.read_metadata(os.path.join(root, f))
                    mn = min(
                        md.row_group(i).column(
                            md.schema.names.index(col)
                        ).statistics.min
                        for i in range(md.num_row_groups)
                    )
                    mx = max(
                        md.row_group(i).column(
                            md.schema.names.index(col)
                        ).statistics.max
                        for i in range(md.num_row_groups)
                    )
                    if mn <= hi and mx >= lo:
                        touched += 1
            return touched

        # selective filter on y (the non-sorted dimension of the linear layout)
        z_touched = files_touched(z_path, "y", 0, 31)
        lin_touched = files_touched(lin_path, "y", 0, 31)
        assert lin_touched == 16  # x-sorted layout cannot prune y at all
        assert z_touched <= 8  # z-order keeps y envelopes tight
        # and the z layout still prunes x too
        assert files_touched(z_path, "x", 0, 31) <= 8


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """200 tiny appended files must compact to the byte-target count,
    preserve every row, and honor the within-file sort order."""
    import glob

    from gov_data_pipeline_spark.operators.layout import compact_parquet

    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    # simulate a micro-batch producer: 20 appends of 10 rows each
    for i in range(20):
        spark.range(i * 10, (i + 1) * 10).withColumn(
            "v", F.col("id") * 2
        ).coalesce(1).write.mode("append").parquet(src)
    assert len(glob.glob(src + "/part-*")) >= 20

    # a large byte target -> everything in one file
    n = compact_parquet(spark, src, dest, target_file_bytes=1 << 30,
                        sort_within_by=["id"])
    assert n == 1
    parts = [p for p in glob.glob(dest + "/part-*") if not p.endswith(".crc")]
    assert len(parts) == 1
    back = spark.read.parquet(dest)
    assert back.count() == 200
    assert {r["id"] for r in back.collect()} == set(range(200))
    # within-file order restored for footer pruning
    import pyarrow.parquet as pq

    ids = pq.read_table(parts[0], columns=["id"]).column("id").to_pylist()
    assert ids == sorted(ids)
