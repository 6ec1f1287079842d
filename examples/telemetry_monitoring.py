"""Runnable telemetry-profiling + drift-monitoring demo — the round-7
statistical family composed: profile the event stream, freeze the
profile, then watch a simulated live stream drift away from it.

    python examples/telemetry_monitoring.py [sf_dir]

Stages: profile (percentiles / correlation / trend / OHLC bars) ->
freeze reference deciles -> stream two micro-batches (one faithful,
one shifted) through the PSI drift sink -> print the per-batch scores.
Defaults to the smallest fixture.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from gov_data_pipeline_spark.catalog import read_table
from gov_data_pipeline_spark.queries.events_analytics import (
    q117_ohlc_bars,
    q119_trend_regression,
    q124_ab_welch,
)
from gov_data_pipeline_spark.queries.stats_ml import (
    q111_grouped_percentiles,
    q116_mad_outliers,
)
from gov_data_pipeline_spark.session import get_spark
from gov_data_pipeline_spark.streaming.monitor import (
    psi_drift_sink,
    reference_profile,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="telemetry-monitoring-demo")

    print("— batch profile —")
    q111_grouped_percentiles(spark, sf_dir).show(5, truncate=False)
    q116_mad_outliers(spark, sf_dir).show(5, truncate=False)
    q119_trend_regression(spark, sf_dir).show(5, truncate=False)
    q124_ab_welch(spark, sf_dir).show(5, truncate=False)
    print(f"hourly OHLC bars: {q117_ohlc_bars(spark, sf_dir).count()} rows")

    print("— streaming drift monitor —")
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    profile = reference_profile(events)

    work = tempfile.mkdtemp(prefix="telemetry_demo_")
    try:
        src = f"{work}/stream"
        events.coalesce(1).write.parquet(f"{work}/staged/ok")
        events.withColumn("value", F.col("value") * 5 + 50).coalesce(1).write.parquet(
            f"{work}/staged/shifted"
        )
        import glob
        import os

        os.makedirs(src)
        for i, f_ in enumerate(
            sorted(glob.glob(f"{work}/staged/*/part-*.parquet"))
        ):
            shutil.copy(f_, f"{src}/file_{i}.parquet")

        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            psi_drift_sink(stream, profile, f"{work}/out", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        spark.read.parquet(f"{work}/out").orderBy("batch_id", "event_type").show(
            30, truncate=False
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print("— alert shaping: gap throttle vs token bucket (batch twins) —")
    from gov_data_pipeline_spark.streaming import (
        throttle_dedup,
        token_bucket_throttle,
    )

    all_events = read_table(spark, sf_dir, "events")
    gap_kept = throttle_dedup(all_events, gap_seconds=43200).count()
    bucket_kept = token_bucket_throttle(
        all_events, rate_tokens=1, per_seconds=86400, burst=2
    ).count()
    total = all_events.count()
    print(f"  raw events:          {total}")
    print(f"  gap throttle (12 h): {gap_kept} kept — bursts collapse to heads")
    print(
        f"  token bucket (1/day, burst 2): {bucket_kept} kept — floods drop "
        "but the average rate never starves"
    )

    print("— capped sessions (gap OR 4-event flush; batch twin) —")
    from gov_data_pipeline_spark.streaming import capped_session_stats

    sess = capped_session_stats(all_events, gap_seconds=43200, max_events=4)
    sess.groupBy("n_events").count().orderBy("n_events").show()


if __name__ == "__main__":
    main()
