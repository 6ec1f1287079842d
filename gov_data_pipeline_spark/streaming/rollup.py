"""Streaming maintenance of a continuous hourly aggregate — the
incremental form of q97's hypertable rollup (`queries/corpus_ops.py`):
a metrics table that stays current while the event stream runs,
without ever re-reading history.

Design: each micro-batch writes its ADDITIVE contribution — count /
sum / min / max per (key, hour) — under ``out_path/batch_id=N``.
Those are exactly the partial aggregates Spark's own two-phase
aggregation produces map-side; persisting them per batch makes the
final combine a read-time concern and the batch write idempotent:

- **Exactly-once**: a checkpoint-replayed batch recomputes the same
  partials and overwrites the same ``batch_id=N`` directory — the
  partition is the idempotence mechanism (`monitor.py`'s argument).
- **No read-modify-write**: the sink never reads the rollup it
  maintains, so there is no state to corrupt and no lock to take;
  concurrent readers see either the old or the new partition list.
- **Bounded merge cost**: reading the rollup combines one row per
  (batch × key × hour) — compact with `operators/layout.
  compact_parquet` when batch count grows, exactly like any
  partial-aggregate spill.

At 100 TB the contribution per batch is (keys × hours touched) rows —
kilobytes — regardless of batch size; the heavy reduction happened
map-side inside the batch's own aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import DataStreamWriter


def incremental_hourly_rollup_sink(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataStreamWriter:
    """foreachBatch sink writing each micro-batch's additive hourly
    partials under ``out_path/batch_id=N`` (overwrite-idempotent)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        agg = (
            batch_df.groupBy(
                key_col, F.date_trunc("hour", F.col(ts_col)).alias("bar")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(value_col).alias("sum_v"),
                F.min(value_col).alias("min_v"),
                F.max(value_col).alias("max_v"),
            )
        )
        agg.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )


def read_hourly_rollup(
    spark: SparkSession, out_path: str, key_col: str = "event_type"
) -> DataFrame:
    """Combine the persisted batch partials into the current rollup —
    the final-aggregate half of the two-phase split (count/sum/min/max
    merge associatively; the mean is derived at read time)."""
    parts = spark.read.parquet(out_path)
    return (
        parts.groupBy(key_col, "bar")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .withColumn("mean_v", F.col("sum_v") / F.col("n"))
        .orderBy(key_col, "bar")
    )
