"""Structured Streaming surface (SURVEY L9/L10).

Every transformation here is written once against the DataFrame API and
runs unchanged in batch and streaming mode — the t2 oracle checks the
batch execution, the streaming tests (tests/test_streaming.py) run the
identical plan through a file stream with watermarks + memory sink.

Scale notes: windowed streaming aggregations keep state per
(window, key); the watermark bounds that state — without it state grows
forever. Session windows additionally merge state; Spark requires a
watermark for them in append mode. ``dropDuplicatesWithinWatermark``
bounds dedup state the same way (L10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events directory (parquet files with
    micros timestamps, e.g. written by the tests' feeder)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts per event_type (L9)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) window stats: each event lands in
    window/slide overlapping windows (L9)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # avg = trunc4(round(sum,2)/n). The 2-decimal rounding
            # absorbs partial-aggregation ulp noise (sums of 2-decimal
            # values sit far from .005 boundaries), and truncation —
            # unlike round() — is a pure function of the double bits, so
            # engines with different rounding implementations agree even
            # when n divides the sum onto a half boundary (n=8 does).
            (
                F.floor(F.round(F.sum("value"), 2) * 10000 / F.count(F.lit(1))) / 10000
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: events merge while the gap to the
    previous event is < ``gap`` (L9; the streaming-native form of the
    T23 sessionize rewrite)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """L10: drop duplicate event_ids, keeping state only within the
    watermark horizon. In batch mode this degrades to plain
    dropDuplicates (no state bound needed)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream (or batch-batch — same code) event-time interval
    join: each purchase matches the same user's clicks in the preceding
    ``max_gap`` (attribution). Inner join, so Spark needs watermarks on
    BOTH sides plus the time-range predicate to bound join state: each
    side buffers only rows younger than watermark + gap, and state is
    evicted as the watermark advances. Without the range predicate the
    state store would hold both full streams forever — the unbounded
    mistake this operator exists to encode correctly once.

    Output: (user_id, click_id, purchase_id, click_ts, purchase_ts,
    gap_micros).
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}"))
    )
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        (
            F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))
        ).alias("gap_micros"),
    )
