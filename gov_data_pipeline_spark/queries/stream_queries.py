"""Event-time window queries (SURVEY L9/L10) — the batch execution of
the exact streaming plans in ``gov_data_pipeline_spark.streaming``
(same functions, same column lineage), so the DuckDB oracle certifies
the semantics the stream runs with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gov_data_pipeline_spark.catalog import read_table as _t
from gov_data_pipeline_spark.streaming import (
    capped_session_stats,
    token_bucket_throttle,
    click_purchase_join,
    cumulative_alerts,
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


# ---------------------------------------------------------------------------
# Time-series gap-fill + forward-fill (hypertable-rollup shape): hourly
# buckets per user over each user's active span; empty buckets carry the
# last observed value forward. Spark: sequence() to generate the dense
# bucket spine (no driver-side loop), left join, last(ignorenulls).
# ---------------------------------------------------------------------------


def q64_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = _t(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
        )
        .agg(F.round(F.sum("value"), 2).alias("hour_value"))
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    joined = spine.join(hourly, ["user_id", "bucket"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        joined.withColumn("filled", F.last("hour_value", ignorenulls=True).over(w))
        .withColumn("was_gap", F.col("hour_value").isNull().cast("int"))
        .select("user_id", "bucket", "filled", "was_gap")
        .orderBy("user_id", "bucket")
    )


_Q64_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         round(sum(value), 2) AS hour_value
  FROM events GROUP BY 1, 2),
spans AS (
  SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
  FROM hourly GROUP BY user_id),
spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM spans),
joined AS (
  SELECT s.user_id, s.bucket, h.hour_value
  FROM spine s LEFT JOIN hourly h
    ON s.user_id = h.user_id AND s.bucket = h.bucket)
SELECT user_id, bucket,
       last_value(hour_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
       CAST(hour_value IS NULL AS INT) AS was_gap
FROM joined
ORDER BY user_id, bucket
"""


# ---------------------------------------------------------------------------
# Deterministic hash sampling — the reproducible subsampling / train-test
# split primitive for training corpora: membership is a pure function of
# the stable id (md5 on both engines), so samples are stable across
# runs, clusters, and engines; no RNG state, no reservoir.
# ---------------------------------------------------------------------------


def q65_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.functions.sampling import hash_bucket_col

    docs = _t(spark, sf_dir, "documents")
    # first md5 byte of the id -> uniform 0..255; keep < 64 (25% sample)
    bucket = hash_bucket_col(F.col("doc_id"))
    return (
        docs.withColumn("hash_bucket", bucket)
        .filter(F.col("hash_bucket") < 64)
        .withColumn(
            "split",
            F.when(F.col("hash_bucket") < 16, F.lit("test")).otherwise(F.lit("train")),
        )
        .select("doc_id", "hash_bucket", "split")
        .orderBy("doc_id")
    )


_Q65_SQL = """
WITH hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) AS hash_bucket
  FROM documents)
SELECT doc_id, hash_bucket,
       CASE WHEN hash_bucket < 16 THEN 'test' ELSE 'train' END AS split
FROM hashed
WHERE hash_bucket < 64
ORDER BY doc_id
"""


def q66_cumulative_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the custom stateful operator
    (streaming/stateful.py): per-user running-total threshold alerts.
    The streaming form (applyInPandasWithState) is asserted equal to
    this plan in tests/test_streaming.py."""
    events = _t(spark, sf_dir, "events")
    return cumulative_alerts(events, threshold=1000.0).orderBy("user_id", "event_id")


# Integer-cents arithmetic mirroring the engine's state loop (floor
# division via pmod so negative running totals agree with Python //);
# threshold 1000.00 -> 100000 cents.
_Q66_SQL = """
WITH cum AS (
  SELECT user_id, event_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
         sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM events),
lv AS (
  SELECT *,
         (cc - ((cc % 100000) + 100000) % 100000) // 100000 AS lvl,
         ((cc - vc) - (((cc - vc) % 100000) + 100000) % 100000) // 100000 AS lvl_prev
  FROM cum)
SELECT user_id, event_id, ts,
       cc / 100.0 AS cum_value,
       CAST(lvl AS INT) AS level
FROM lv
WHERE lvl > lvl_prev
ORDER BY user_id, event_id
"""


def q157_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the timer-based custom stateful operator
    (streaming/stateful.capped_session_stats): per-user sessions that
    close on a 12 h inactivity gap OR after 4 events, whichever first
    — the count cap is state-dependent and inexpressible with
    F.session_window, and the silent-user flush needs an event-time
    TIMER (GroupStateTimeout.EventTimeTimeout). The streaming form is
    asserted equal to this plan in tests/test_streaming.py; value sums
    are exact integer cents, so stream, batch, and oracle agree
    bit-for-bit."""
    events = _t(spark, sf_dir, "events")
    # session_end/n_events/sum_cents tiebreaks: a cap-flushed session
    # and its successor can share (user_id, session_start) when
    # >= max_events events carry one timestamp — and two such flushes
    # from >= 2*max_events same-timestamp events tie on all of
    # (start, end, n_events) while differing in sum_cents, so the sum
    # joins the key to make the ordering total in both engines.
    return capped_session_stats(events, gap_seconds=43200, max_events=4).orderBy(
        "user_id", "session_start", "session_end", "n_events", "sum_cents"
    )


# Two-window form: the q13 cumulative-flag gap session id, then
# (row_number - 1) // cap inside it. Cents arithmetic as in q66.
_Q157_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 43200000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
gids AS (
  SELECT *,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS gid
  FROM flagged),
subs AS (
  SELECT *,
         (row_number() OVER (PARTITION BY user_id, gid
                             ORDER BY ts, event_id) - 1) // 4 AS sid
  FROM gids)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(coalesce(sum(vc), 0) AS BIGINT) AS sum_cents
FROM subs
GROUP BY user_id, gid, sid
ORDER BY user_id, session_start, session_end, n_events, sum_cents
"""


def q161_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the token-bucket rate limiter
    (streaming/stateful.token_bucket_throttle): per-user bucket of 2
    tokens refilling 1/day; kept events consume a token, floods drain
    the bucket and get dropped WITHOUT starving the average rate (the
    guarantee the gap throttle q148/q150 cannot make). The recurrence
    is non-associative, so batch mode is one applyInPandas per user
    over (user, event, ts) rows only — the NFD-packer shape — and the
    oracle is a per-key linear recursive CTE. Balances are integer
    units (1 token = 86 400e6 = day micros), so stream, batch, and
    oracle agree bit-for-bit."""
    events = _t(spark, sf_dir, "events")
    return token_bucket_throttle(
        events, rate_tokens=1, per_seconds=86400, burst=2
    ).orderBy("user_id", "event_id")


# Per-key linear recursion (the q149-oracle pattern): row n's verdict
# and balance derive from row n-1's. U = one token in integer units;
# refill = dt_us * rate is a pure integer multiply in both engines.
_Q161_SQL = """
WITH RECURSIVE ordered AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL),
step AS (
  SELECT user_id, rn, event_id, ts, us,
         CAST(86400000000 AS BIGINT) AS tokens,  -- full burst minus one
         TRUE AS kept
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn, o.event_id, o.ts, o.us,
         CASE WHEN least(s.tokens + (o.us - s.us) * 1,
                         CAST(172800000000 AS BIGINT)) >= 86400000000
              THEN least(s.tokens + (o.us - s.us) * 1,
                         CAST(172800000000 AS BIGINT)) - 86400000000
              ELSE least(s.tokens + (o.us - s.us) * 1,
                         CAST(172800000000 AS BIGINT)) END,
         least(s.tokens + (o.us - s.us) * 1,
               CAST(172800000000 AS BIGINT)) >= 86400000000
  FROM step s
  JOIN ordered o ON o.user_id = s.user_id AND o.rn = s.rn + 1)
SELECT user_id, event_id, ts, CAST(tokens AS BIGINT) AS tokens_after
FROM step WHERE kept
ORDER BY user_id, event_id
"""


def q76_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the stream-stream interval join (attribution:
    purchases matched to the same user's clicks within the prior 30
    minutes). The streaming form adds watermarks on both sides; the
    stream-equals-batch test runs the identical lineage through file
    streams."""
    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    return click_purchase_join(clicks, purchases).orderBy(
        "purchase_id", "click_id"
    )


_Q76_SQL = """
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_micros
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
ORDER BY purchase_id, click_id
"""


def q150_stream_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch execution of the continuous event-throttle operator
    (streaming/stateful.throttle_dedup — q148's kept set as a
    STREAM): only burst-head events pass; the suppression anchor is
    the previous event, emitted or not. The applyInPandasWithState
    form is asserted equal to this plan in tests/test_streaming.py."""
    from gov_data_pipeline_spark.streaming import throttle_dedup

    events = _t(spark, sf_dir, "events")
    return throttle_dedup(events, gap_seconds=86400).orderBy("event_id")


_Q150_SQL = """
WITH flagged AS (
  SELECT user_id, event_type, event_id, ts,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts NULLS FIRST, event_id),
                   ts) AS g
  FROM events)
SELECT user_id, event_type, event_id, ts
FROM flagged
WHERE g IS NULL OR g > 86400000000
ORDER BY event_id
"""


QUERIES = {
    "q60_tumbling": q60_tumbling,
    "q150_stream_throttle": q150_stream_throttle,
    "q76_stream_join": q76_stream_join,
    "q61_sliding": q61_sliding,
    "q62_session_window": q62_session_window,
    "q63_stream_dedup": q63_stream_dedup,
    "q64_gapfill": q64_gapfill,
    "q65_hash_sample": q65_hash_sample,
    "q66_cumulative_alerts": q66_cumulative_alerts,
    "q157_capped_sessions": q157_capped_sessions,
    "q161_token_bucket": q161_token_bucket,
}

ORACLE = {
    "q66_cumulative_alerts": _Q66_SQL,
    "q157_capped_sessions": _Q157_SQL,
    "q161_token_bucket": _Q161_SQL,
    "q150_stream_throttle": _Q150_SQL,
    "q76_stream_join": _Q76_SQL,
    "q60_tumbling": _Q60_SQL,
    "q61_sliding": _Q61_SQL,
    "q62_session_window": _Q62_SQL,
    "q63_stream_dedup": _Q63_SQL,
    "q64_gapfill": _Q64_SQL,
    "q65_hash_sample": _Q65_SQL,
}
