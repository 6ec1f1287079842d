"""Event/metric analytics: the product-analytics surface over an
event log — ordered funnels, cohort retention, unpivot (melt),
time-weighted averages, session paths, value histograms, OHLC time
bars, OLS trend detection, Markov transition matrices, Welch A/B
readouts, hourly percentile bands, and time-to-convert latency
(SURVEY §2.2's T15/T21/T31 families composed; the reference has no
event analytics at all).

Shared scale shape: every query is either a key-partitioned aggregate
chain (the log hashes once on ``user_id``/``event_type`` and each
stage reuses that partitioning — no self-join of the raw log, the
classic funnel scale-killer) or a single grouped aggregate whose
output is bounded by group count, never row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from gov_data_pipeline_spark.catalog import read_table as _t


# ---------------------------------------------------------------------------
# q102 — ordered funnel: view -> click -> purchase.
# ---------------------------------------------------------------------------


def q102_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel completion: a user converts step N only
    with an event at-or-after their step-N-1 time. Three per-user
    aggregates chained by co-partitioned joins on user_id — the
    shuffle is paid once and reused; nothing joins the raw log to
    itself.

    Output: one row per step with the surviving user count and the
    conversion rate vs step 1 (rounded; step 1 rate is 1.0 by
    definition).
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    base = t1.agg(F.count(F.lit(1)).alias("n_base"))
    n1 = base.select(
        F.lit(1).alias("step"), F.lit("view").alias("event_type"),
        F.col("n_base").alias("n"),
    )
    n2 = t2.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(2).alias("step"), F.lit("click").alias("event_type"), "n"
    )
    n3 = t3.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(3).alias("step"), F.lit("purchase").alias("event_type"), "n"
    )
    steps = n1.unionByName(n2).unionByName(n3)
    return (
        steps.crossJoin(F.broadcast(base))
        .select(
            "step",
            "event_type",
            "n",
            F.round(F.col("n") / F.greatest(F.col("n_base"), F.lit(1)), 4).alias(
                "conversion"
            ),
        )
        .orderBy("step")
    )


_Q102_SQL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts >= t1.t1
  GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2
  GROUP BY e.user_id),
steps AS (
  SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM t1) AS n
  UNION ALL
  SELECT 2, 'click', (SELECT count(*) FROM t2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT count(*) FROM t3))
SELECT step, event_type, n,
       round(n / greatest((SELECT count(*) FROM t1), 1), 4) AS conversion
FROM steps
ORDER BY step
"""


# ---------------------------------------------------------------------------
# q103 — cohort retention: first-activity-day cohorts x day offset.
# ---------------------------------------------------------------------------


def q103_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped by first-activity day
    (cohort), counted on each later activity day as a day offset.
    Two key-partitioned aggregates (first-day per user; distinct
    user-day) joined on user_id, then a tiny (cohort, offset) rollup —
    the event log never self-joins.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .select(
            "cohort",
            F.datediff(F.col("day"), F.col("cohort")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort", "day_offset")
        # plain count: rows are distinct (user_id, day) and day is
        # determined by (cohort, offset), so each user appears at most
        # once per group — a distinct aggregate would re-hash user_id
        # for no semantic gain
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "day_offset")
    )


_Q103_SQL = """
WITH ev AS (
  SELECT user_id, date_trunc('day', ts) AS day FROM events),
first AS (
  SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, day FROM ev)
SELECT f.cohort,
       datediff('day', f.cohort, a.day) AS day_offset,
       count(*) AS n_users
FROM active a JOIN first f ON a.user_id = f.user_id
GROUP BY f.cohort, datediff('day', f.cohort, a.day)
ORDER BY cohort, day_offset
"""


# ---------------------------------------------------------------------------
# q106 — unpivot (melt): wide metric columns -> (metric, value) rows.
# ---------------------------------------------------------------------------


def q106_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/T17's inverse surface: melt lineitem's three measure columns
    into (metric, value) rows with ``unpivot`` (Spark's native melt —
    compiles to a Generate/Expand, one pass, no join), then aggregate
    per (returnflag, metric). The long form is what generic
    metric-store sinks and per-metric quality monitors consume."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    )
    melted = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return (
        melted.groupBy("l_returnflag", "metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("l_returnflag", "metric")
    )


_Q106_SQL = """
WITH melted AS (
  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
SELECT l_returnflag, metric,
       count(*) AS n,
       round(sum(value), 2) AS sum_value,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value
FROM melted
GROUP BY l_returnflag, metric
ORDER BY l_returnflag, metric
"""


# ---------------------------------------------------------------------------
# q108 — time-weighted average (irregular time series, hold-forward).
# ---------------------------------------------------------------------------


def q108_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted mean of ``value`` per user under hold-forward
    semantics: each observation counts for the microseconds until the
    user's next event (the last observation carries no duration). The
    continuous-aggregate op plain ``avg`` gets WRONG on irregular
    series — a value held for an hour must outweigh one held for a
    second.

    One window (lead over the user partition, fully tie-broken by
    event_id) and one aggregate on the same key — a single shuffle.
    Weights are integer microseconds in both engines, so only the
    final weighted mean is float; users with a single event (no
    duration at all) drop.
    """
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = (
        F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    ).alias("w_us")
    return (
        ev.select("user_id", "value", us)
        .filter(F.col("w_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum("w_us").alias("total_us"),
            F.round(
                F.try_divide(
                    F.sum(F.col("value") * F.col("w_us")), F.sum("w_us")
                ),
                4,
            ).alias("tw_avg"),
        )
        .filter(F.col("total_us") > 0)
        .orderBy("user_id")
    )


_Q108_SQL = """
WITH weighted AS (
  SELECT user_id, value,
         date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) AS w_us
  FROM events)
SELECT user_id,
       CAST(sum(w_us) AS BIGINT) AS total_us,
       round(sum(value * w_us) / sum(w_us), 4) AS tw_avg
FROM weighted
WHERE w_us IS NOT NULL
GROUP BY user_id
HAVING sum(w_us) > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q109 — session path analysis (top event-type sequences).
# ---------------------------------------------------------------------------


def q109_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which journeys do users actually take? Events sessionize (30 min
    gap, the q13 operator), each session collapses to its ordered
    event-type path string, and the most frequent paths surface.
    Composition evidence: ``sessionize`` (T23) + ordered group-concat
    (T18) + top-k (T25) chained as one oracle-checked query.

    The path build is ONE aggregate per (user, session): collect the
    (ts, event_id, type) structs, array_sort (codegen'd, fully
    tie-broken), project the types — no per-session window re-sort.
    Sessions are bounded by the 30-min gap, so the collected array is
    small by construction; the path-frequency rollup then moves only
    (path, count) pairs."""
    from gov_data_pipeline_spark.operators.relational import sessionize

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    sess = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800)
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    w = W.partitionBy(F.lit(1)).orderBy(F.col("n_sessions").desc(), F.col("path"))
    return (
        paths.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 20)
        .select("rk", "path", "n_sessions")
        .orderBy("rk")
    )


_Q109_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, session_id),
freq AS (
  SELECT path, count(*) AS n_sessions FROM paths GROUP BY path),
ranked AS (
  SELECT path, n_sessions,
         row_number() OVER (ORDER BY n_sessions DESC, path) AS rk
  FROM freq)
SELECT CAST(rk AS INT) AS rk, path, n_sessions
FROM ranked WHERE rk <= 20
ORDER BY rk
"""


# ---------------------------------------------------------------------------
# q110 — fixed-width value histogram per event type.
# ---------------------------------------------------------------------------


def q110_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profiling: 10 equal-width buckets of ``value`` per
    event type between that type's min and max. The per-type extremes
    are a 5-row aggregate broadcast back over the scan (the q93/q100
    two-phase shape); the bucket expression is identical in both
    engines so edge values land identically. A degenerate type
    (min == max) collapses to bucket 0 via the null-safe division."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    ext = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bucket = F.coalesce(
        F.least(
            F.floor(
                F.try_divide(
                    F.col("value") - F.col("lo"),
                    (F.col("hi") - F.col("lo")) / 10,
                )
            ),
            F.lit(9),
        ),
        F.lit(0),
    ).cast("int")
    return (
        ev.join(F.broadcast(ext), "event_type")
        .select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bucket")
    )


_Q110_SQL = """
WITH ext AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi
  FROM events GROUP BY event_type)
SELECT e.event_type,
       CAST(coalesce(least(floor((e.value - x.lo) / ((x.hi - x.lo) / 10)), 9),
                     0) AS INT) AS bucket,
       count(*) AS n
FROM events e JOIN ext x ON e.event_type = x.event_type
GROUP BY e.event_type, bucket
ORDER BY e.event_type, bucket
"""


# ---------------------------------------------------------------------------
# q117 — OHLC time-bar resampling (irregular events -> hourly bars).
# ---------------------------------------------------------------------------


def q117_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the irregular event stream to hourly OHLC bars per
    event type — the continuous-aggregate / time-bar op every metrics
    hypertable serves. Open/close are ``min_by``/``max_by`` over the
    struct key (ts, event_id) — fully tie-broken, and the whole bar is
    ONE hash aggregate over one scan; the textbook formulation needs
    two window passes over the log (the oracle runs that form, so the
    single-aggregate rewrite is value-verified against it).
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    key = F.struct("ts", "event_id")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bar"))
        .agg(
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            F.count(F.lit(1)).alias("n"),
            # sum, not mean: fixture values carry 2 decimals, so the
            # bar total rounds exactly at 2 dp in both engines — a mean
            # (÷n) can land precisely on a round-half boundary where
            # Spark (HALF_UP) and DuckDB disagree in the last digit
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type", "bar")
    )


_Q117_SQL = """
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS bar, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rl
  FROM events)
SELECT event_type, bar,
       round(max(CASE WHEN rf = 1 THEN value END), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(max(CASE WHEN rl = 1 THEN value END), 4) AS close,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM ranked
GROUP BY event_type, bar
ORDER BY event_type, bar
"""


# ---------------------------------------------------------------------------
# q119 — per-type linear trend (built-in OLS aggregates).
# ---------------------------------------------------------------------------


def q119_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric drift as a regression: value ~ time (in days), per event
    type, via the built-in OLS co-moment aggregates (``regr_slope`` /
    ``regr_intercept`` / ``regr_r2``) — one partial+final hash
    aggregate over one scan, the sketch merging associatively exactly
    like q112's correlations. The time axis is integer microseconds
    divided by a constant, so both engines regress on bit-identical
    doubles."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros(F.col("ts")) / F.lit(86400000000.0)).alias("x_days"),
        "value",
    )
    def _nn(c):
        # zero-variance degenerate group: Spark's regr_* yield NaN,
        # DuckDB NULL — pin NULL so the engines can never diverge
        return F.nanvl(c, F.lit(None).cast("double"))

    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(_nn(F.regr_slope("value", "x_days")), 6).alias("slope_per_day"),
            F.round(_nn(F.regr_intercept("value", "x_days")), 4).alias("intercept"),
            F.round(_nn(F.regr_r2("value", "x_days")), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


_Q119_SQL = """
SELECT event_type,
       count(*) AS n,
       round(regr_slope(value, epoch_us(ts) / 86400000000.0), 6)
         AS slope_per_day,
       round(regr_intercept(value, epoch_us(ts) / 86400000000.0), 4)
         AS intercept,
       round(regr_r2(value, epoch_us(ts) / 86400000000.0), 6) AS r2
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q126 — hourly percentile bands (the latency-dashboard query).
# ---------------------------------------------------------------------------


def q126_hourly_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95 bands of ``value`` per (event type, hour-of-day) — the
    dashboard query behind every latency/size SLO panel. One grouped
    array-percentile aggregate over one scan (the q111 shape with a
    time dimension): 5 types × 24 hours = 120 output rows however big
    the log is. Exact percentiles here are the oracle-checkable
    baseline; the 100 TB swap is `approx_percentile` with the plan
    shape unchanged (q26/q111 note)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hod"), "value"
    )
    agg = ev.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, array(0.5D, 0.95D))").alias("p"),
    )
    return agg.select(
        "event_type",
        "hod",
        "n",
        F.round(F.col("p")[0], 4).alias("p50"),
        F.round(F.col("p")[1], 4).alias("p95"),
    ).orderBy("event_type", "hod")


_Q126_SQL = """
SELECT event_type,
       CAST(extract(hour FROM ts) AS INT) AS hod,
       count(*) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95
FROM events
GROUP BY event_type, hod
ORDER BY event_type, hod
"""


# ---------------------------------------------------------------------------
# q127 — time-to-convert distribution (view -> purchase latency).
# ---------------------------------------------------------------------------


def q127_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long does conversion take? Per user, the delay from first
    view to the first purchase at-or-after it (q102's strict ordering
    rule), summarized as exact p50/p90 in minutes. Two per-user min
    aggregates chained on the co-partitioned user key — the q102
    funnel shape — then one global percentile over user-sized data.
    The delay is integer microseconds divided by a constant, so both
    engines aggregate bit-identical doubles."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    tp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
        .join(t1, "user_id")
        .select(
            (
                (F.unix_micros("tp") - F.unix_micros("t1"))
                / F.lit(60000000.0)
            ).alias("mins")
        )
    )
    base = t1.agg(F.count(F.lit(1)).alias("n_viewers"))
    return (
        tp.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(F.expr("percentile(mins, 0.5D)"), 2).alias("p50_mins"),
            F.round(F.expr("percentile(mins, 0.9D)"), 2).alias("p90_mins"),
        )
        .crossJoin(F.broadcast(base))
        .select("n_viewers", "n_converted", "p50_mins", "p90_mins")
    )


_Q127_SQL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
tp AS (
  SELECT e.user_id, min(e.ts) AS tp FROM events e
  JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= t1.t1
  GROUP BY e.user_id),
delays AS (
  SELECT date_diff('microsecond', t1.t1, tp.tp) / 60000000.0 AS mins
  FROM tp JOIN t1 ON tp.user_id = t1.user_id)
SELECT (SELECT count(*) FROM t1) AS n_viewers,
       count(*) AS n_converted,
       round(quantile_cont(mins, 0.5), 2) AS p50_mins,
       round(quantile_cont(mins, 0.9), 2) AS p90_mins
FROM delays
"""


# ---------------------------------------------------------------------------
# q124 — A/B comparison with Welch's t statistic.
# ---------------------------------------------------------------------------


def q124_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: split users into A/B by the deterministic
    user_id parity (the q114 cohort rule), compare mean ``value`` per
    event type, and report Welch's t — the unequal-variance test a
    metrics platform runs on every experiment metric. ONE grouped
    aggregate computes both arms via conditional aggregation (no
    self-join, no second scan); the t statistic is assembled from the
    six broadcast-sized moments.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "value", (F.col("user_id") % 2).alias("g")
    )
    a = F.col("g") == 0
    b = F.col("g") == 1
    agg = ev.groupBy("event_type").agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(b, 1)).alias("n_b"),
        F.avg(F.when(a, F.col("value"))).alias("m_a"),
        F.avg(F.when(b, F.col("value"))).alias("m_b"),
        F.var_samp(F.when(a, F.col("value"))).alias("v_a"),
        F.var_samp(F.when(b, F.col("value"))).alias("v_b"),
    )
    t = (F.col("m_b") - F.col("m_a")) / F.sqrt(
        F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    )
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(F.col("m_a"), 4).alias("mean_a"),
        F.round(F.col("m_b"), 4).alias("mean_b"),
        F.round(F.col("m_b") - F.col("m_a"), 4).alias("lift"),
        F.round(t, 4).alias("welch_t"),
    ).orderBy("event_type")


_Q124_SQL = """
WITH agg AS (
  SELECT event_type,
         count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_a,
         count(CASE WHEN user_id % 2 = 1 THEN 1 END) AS n_b,
         avg(CASE WHEN user_id % 2 = 0 THEN value END) AS m_a,
         avg(CASE WHEN user_id % 2 = 1 THEN value END) AS m_b,
         var_samp(CASE WHEN user_id % 2 = 0 THEN value END) AS v_a,
         var_samp(CASE WHEN user_id % 2 = 1 THEN value END) AS v_b
  FROM events GROUP BY event_type)
SELECT event_type, n_a, n_b,
       round(m_a, 4) AS mean_a,
       round(m_b, 4) AS mean_b,
       round(m_b - m_a, 4) AS lift,
       round((m_b - m_a) / sqrt(v_a / n_a + v_b / n_b), 4) AS welch_t
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q123 — Markov transition matrix over per-user event sequences.
# ---------------------------------------------------------------------------


def q123_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov model of user behavior: P(next event type |
    current event type), estimated from each user's time-ordered
    sequence. One lag window co-partitioned on user_id (the q11/q13
    key), one (prev, next) count aggregate, and the per-prev totals
    come back as a broadcast of a #types-sized relation — the log
    never self-joins and only (prev, next, n) pairs cross the final
    exchange. Transition probability is an exact integer ratio, so
    both engines round the identical double.
    """
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 4).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


_Q123_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type),
totals AS (
  SELECT prev_type, sum(n) AS tot FROM pairs GROUP BY prev_type)
SELECT p.prev_type, p.next_type, p.n,
       round(p.n / t.tot, 4) AS p
FROM pairs p JOIN totals t ON p.prev_type = t.prev_type
ORDER BY p.prev_type, p.next_type
"""


# ---------------------------------------------------------------------------
# q148 — time-windowed event dedup (throttle/coalesce): within each
# (user_id, event_type) stream, a BURST is a maximal run of events each
# within 24 h of its predecessor; only the burst's first event is
# "kept". This is event-pipeline dedup (alert throttling, telemetry
# coalescing, retry collapse) — a different axis from content dedup:
# identity is the key + temporal adjacency, not payload equality.
#
# Kept-anchored suppression is the sessionize cumulative-flag trick
# (q13): new_burst = gap NULL or > threshold; burst_id = running sum of
# flags — NOT a plain lag comparison, which would wrongly re-admit the
# third event of a slow-drip chain spaced just under the threshold.
# One window shuffle on the stream key; gaps are integer microseconds
# in both engines (no interval arithmetic to diverge).
# ---------------------------------------------------------------------------

_Q148_GAP_US = 24 * 3600 * 1_000_000


def q148_event_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    # NULLS FIRST pinned EXPLICITLY on both engines (Spark's default,
    # DuckDB's is NULLS LAST): a NULL-ts event sorts to the stream
    # head and keeps as its own burst (can't prove it's a duplicate).
    # The sibling event queries rely on the fixture's ts NOT NULL
    # guarantee instead; this one is NULL-safe by construction.
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc_nulls_first(), "event_id"
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    nb = (
        F.when(gap.isNull() | (gap > F.lit(_Q148_GAP_US)), 1)
        .otherwise(0)
        .alias("__nb")
    )
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        ev.select("event_id", "user_id", "event_type", "ts", nb)
        .withColumn("burst_id", F.sum("__nb").over(run).cast("int"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "burst_id",
            (F.col("__nb") == 1).alias("kept"),
        )
        .orderBy("event_id")
    )


_Q148_SQL = f"""
WITH flagged AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN date_diff('microsecond',
                             lag(ts) OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts NULLS FIRST, event_id),
                             ts) IS NULL
                   OR date_diff('microsecond',
                                lag(ts) OVER (PARTITION BY user_id, event_type
                                              ORDER BY ts NULLS FIRST, event_id),
                                ts) > {_Q148_GAP_US}
              THEN 1 ELSE 0 END AS nb,
         ts
  FROM events),
bursts AS (
  SELECT event_id, user_id, event_type, nb,
         CAST(sum(nb) OVER (PARTITION BY user_id, event_type
                            ORDER BY ts NULLS FIRST, event_id
                            ROWS UNBOUNDED PRECEDING) AS INT) AS burst_id
  FROM flagged)
SELECT event_id, user_id, event_type, burst_id, nb = 1 AS kept
FROM bursts
ORDER BY event_id
"""


QUERIES = {
    "q102_funnel": q102_funnel,
    "q148_event_throttle": q148_event_throttle,
    "q103_retention": q103_retention,
    "q106_unpivot": q106_unpivot,
    "q108_time_weighted_avg": q108_time_weighted_avg,
    "q109_session_paths": q109_session_paths,
    "q110_value_histogram": q110_value_histogram,
    "q117_ohlc_bars": q117_ohlc_bars,
    "q119_trend_regression": q119_trend_regression,
    "q123_markov_transitions": q123_markov_transitions,
    "q124_ab_welch": q124_ab_welch,
    "q126_hourly_percentile_bands": q126_hourly_percentile_bands,
    "q127_time_to_convert": q127_time_to_convert,
}

ORACLE = {
    "q102_funnel": _Q102_SQL,
    "q148_event_throttle": _Q148_SQL,
    "q103_retention": _Q103_SQL,
    "q106_unpivot": _Q106_SQL,
    "q108_time_weighted_avg": _Q108_SQL,
    "q109_session_paths": _Q109_SQL,
    "q110_value_histogram": _Q110_SQL,
    "q117_ohlc_bars": _Q117_SQL,
    "q119_trend_regression": _Q119_SQL,
    "q123_markov_transitions": _Q123_SQL,
    "q124_ab_welch": _Q124_SQL,
    "q126_hourly_percentile_bands": _Q126_SQL,
    "q127_time_to_convert": _Q127_SQL,
}
