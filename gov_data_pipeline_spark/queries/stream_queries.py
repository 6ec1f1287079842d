"""Event-time window queries (SURVEY L9/L10) — the batch execution of
the exact streaming plans in ``gov_data_pipeline_spark.streaming``
(same functions, same column lineage), so the DuckDB oracle certifies
the semantics the stream runs with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gov_data_pipeline_spark.catalog import read_table as _t
from gov_data_pipeline_spark.streaming import (
    dedup_within_watermark,
    session_counts,
    sliding_stats,
    tumbling_counts,
)


def q60_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return tumbling_counts(events).orderBy("window_start", "event_type")


_Q60_SQL = """
SELECT date_trunc('hour', ts)                    AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR  AS window_end,
       event_type,
       count(*)                                  AS n_events,
       round(sum(value), 2)                      AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


def q61_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return sliding_stats(events).orderBy("window_start")


# A 1h/30m hopping window: every event belongs to the window starting at
# its 30-minute bucket and the one 30 minutes earlier.
_Q61_SQL = """
WITH starts AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value FROM events)
SELECT window_start, count(*) AS n_events,
       floor(round(sum(value), 2) * 10000 / count(*)) / 10000 AS avg_value
FROM starts
GROUP BY window_start
ORDER BY window_start
"""


def q62_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return session_counts(events).orderBy("user_id", "session_start")


# session_window merge rule: an event extends the session while
# ts - prev_ts < gap; a gap >= 30 min starts a new session.
_Q62_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
gids AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
  FROM flagged)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM gids
GROUP BY user_id, gid
ORDER BY user_id, session_start
"""


def q63_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    doubled = events.unionByName(events)  # simulate at-least-once delivery
    return (
        dedup_within_watermark(doubled)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
        .orderBy("event_type")
    )


_Q63_SQL = """
WITH doubled AS (SELECT * FROM events UNION ALL SELECT * FROM events),
dedup AS (SELECT DISTINCT ON (event_id) * FROM doubled)
SELECT event_type, count(*) AS n_unique
FROM dedup
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "q60_tumbling": q60_tumbling,
    "q61_sliding": q61_sliding,
    "q62_session_window": q62_session_window,
    "q63_stream_dedup": q63_stream_dedup,
}

ORACLE = {
    "q60_tumbling": _Q60_SQL,
    "q61_sliding": _Q61_SQL,
    "q62_session_window": _Q62_SQL,
    "q63_stream_dedup": _Q63_SQL,
}
