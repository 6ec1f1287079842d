"""Relational query surface: scans, joins, aggregation, windows, sorts,
set operations (SURVEY.md §2.2 T1, T5-T26).

Every query has a DuckDB oracle producing the identical result with the
identical column names. Double aggregates are rounded *inside both
queries* (not post-hoc) so partial-aggregation order differences between
engines cannot leak into the hash compare.

Scale notes are on each query; the shared principles:
- filters/projections are expressed declaratively so Catalyst pushes
  them into the parquet scan;
- small dimensions are broadcast explicitly; fact-fact joins shuffle on
  their keys and rely on AQE for skew;
- every window has a partition key except where a total order is the
  semantics (and then the query aggregates before sorting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gov_data_pipeline_spark.catalog import read_table as _t
from gov_data_pipeline_spark.operators import (
    asof_join,
    attach_row_index,
    sessionize,
    top_k_per_group,
)


# ---------------------------------------------------------------------------
# T1/T5-T9/T15/T24 — pricing summary (TPC-H Q1 shape). Flagship.
# Map-side partial aggregation on 6 tiny groups -> shuffle moves ~6 rows
# per task regardless of input size; scales to 100 TB trivially.
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            # avg as round(sum,2)/n: absorbs partial-agg ulp noise before
            # the division so rounding is engine/plan independent.
            F.round(F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)), 4).alias(
                "avg_qty"
            ),
            F.round(F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1)), 4).alias(
                "avg_price"
            ),
            F.round(F.round(F.sum("l_discount"), 2) / F.count(F.lit(1)), 4).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                          AS sum_qty,
       round(sum(l_extendedprice), 2)                                     AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
       round(round(sum(l_quantity), 2) / count(*), 4)                     AS avg_qty,
       round(round(sum(l_extendedprice), 2) / count(*), 4)                AS avg_price,
       round(round(sum(l_discount), 2) / count(*), 4)                     AS avg_disc,
       count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# T10 — star join: revenue by region/nation for 1997 orders.
# nation/region are broadcast (tiny); lineitem⋈orders and ⋈customer are
# key-shuffled sort-merge joins, the right default at 100 TB (AQE may
# demote to broadcast when a filtered side turns out small).
# ---------------------------------------------------------------------------


def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name", "n_name")
    )


_Q02_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# T11 — semi / anti joins. left_semi/left_anti never materialize the
# probe side's payload — at scale this is strictly cheaper than
# join+distinct.
# ---------------------------------------------------------------------------


def q03_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders_97 = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        cust.join(orders_97, cust.c_custkey == orders_97.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


_Q03_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
ORDER BY c_custkey
"""


def q04_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders_h1_95 = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")
    )
    return (
        cust.join(orders_h1_95, cust.c_custkey == orders_h1_95.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_Q04_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate < TIMESTAMP '1995-07-01')
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# T12 — theta/range join against a tiny in-memory band dimension.
# Non-equi joins in Spark become BroadcastNestedLoopJoin when one side
# is broadcast — the only sane physical plan for band lookup; the bands
# side is O(10) rows so the "nested loop" is a constant per row.
# ---------------------------------------------------------------------------

_BANDS = [
    ("low", 0.0, 100_000.0),
    ("mid", 100_000.0, 200_000.0),
    ("high", 200_000.0, 10_000_000.0),
]


def q05_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("band")
    )


_Q05_SQL = """
SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders
JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 200000.0),
             ('high', 200000.0, 10000000.0)) AS bands(band, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
ORDER BY band
"""


# ---------------------------------------------------------------------------
# T12 scale twin — interval-overlap join via the binning decomposition
# (operators/relational.interval_join). q05's broadcast nested-loop is
# the right call for a 3-row band table; this is the shape for
# interval-vs-interval at fact scale, where the quadratic per-key
# filter of a naive key join dies on long-history keys.
# ---------------------------------------------------------------------------


def q156_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier count of concurrently-in-transit lineitem pairs:
    each lineitem's transit interval is [shipdate, shipdate + dur] with
    a deterministic per-row duration (1-25 days from the line's keys —
    the fixture carries only l_shipdate), and two lineitems of the
    same supplier overlap when their closed intervals intersect.

    The operator joins on (l_suppkey, 30-day bin) and accepts each
    pair exactly once in the bin of the later start — no DISTINCT
    pass, no per-supplier quadratic blowup (600 rows/supplier here
    would already be 180k comparisons per supplier naively; binning
    compares only rows that coexist within a month). The oracle runs
    the textbook quadratic self-join, proving the decomposition exact.
    """
    from gov_data_pipeline_spark.operators.relational import interval_join

    li = _t(spark, sf_dir, "lineitem")
    dur = ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 25 + 1).cast("int")
    items = li.select(
        "l_suppkey",
        F.col("l_orderkey").alias("o"),
        F.col("l_linenumber").alias("ln"),
        F.to_date("l_shipdate").alias("st"),
        F.date_add(F.to_date("l_shipdate"), dur).alias("en"),
    )
    a = items.select(
        "l_suppkey",
        F.col("o").alias("a_o"),
        F.col("ln").alias("a_ln"),
        F.col("st").alias("a_st"),
        F.col("en").alias("a_en"),
    )
    b = items.select(
        "l_suppkey",
        F.col("o").alias("b_o"),
        F.col("ln").alias("b_ln"),
        F.col("st").alias("b_st"),
        F.col("en").alias("b_en"),
    )
    pairs = interval_join(
        a, b, on="l_suppkey",
        left_start="a_st", left_end="a_en",
        right_start="b_st", right_end="b_en",
        # pin the candidate join's parallelism: it expands ~10x over
        # its input, which AQE's byte-based coalescing under-sizes
        num_partitions=spark.sparkContext.defaultParallelism,
    ).where(
        (F.col("a_o") < F.col("b_o"))
        | ((F.col("a_o") == F.col("b_o")) & (F.col("a_ln") < F.col("b_ln")))
    )
    overlap_days = (
        F.datediff(
            F.least(F.col("a_en"), F.col("b_en")),
            F.greatest(F.col("a_st"), F.col("b_st")),
        )
        + 1
    )
    return (
        pairs.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(overlap_days.cast("long")).alias("sum_overlap_days"),
        )
        .orderBy("l_suppkey")
    )


_Q156_SQL = """
WITH it AS (
  SELECT l_suppkey, l_orderkey AS o, l_linenumber AS ln,
         CAST(l_shipdate AS DATE) AS st,
         CAST(l_shipdate AS DATE)
           + CAST((l_orderkey * 7 + l_linenumber) % 25 + 1 AS INT) AS en
  FROM lineitem)
SELECT a.l_suppkey, count(*) AS n_pairs,
       CAST(sum(datediff('day', greatest(a.st, b.st),
                         least(a.en, b.en)) + 1) AS BIGINT)
         AS sum_overlap_days
FROM it a
JOIN it b ON a.l_suppkey = b.l_suppkey
         AND (a.o < b.o OR (a.o = b.o AND a.ln < b.ln))
         AND a.st <= b.en AND b.st <= a.en
GROUP BY a.l_suppkey
ORDER BY a.l_suppkey
"""


# ---------------------------------------------------------------------------
# T13 — as-of join: for each error event, the nearest prior signup by the
# same user. Union-tag + last(ignorenulls) — one key shuffle, linear.
# ---------------------------------------------------------------------------


def q06_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        errors, signups, on="user_id", left_time="ts", right_time="ts", right_values=["value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_ts").alias("signup_ts"),
        F.round("asof_value", 2).alias("signup_value"),
    ).orderBy("event_id")


_Q06_SQL = """
SELECT e.event_id, e.user_id,
       (SELECT max(s.ts) FROM events s
        WHERE s.event_type = 'signup' AND s.user_id = e.user_id AND s.ts <= e.ts)
         AS signup_ts,
       round((SELECT s.value FROM events s
              WHERE s.event_type = 'signup' AND s.user_id = e.user_id AND s.ts <= e.ts
              ORDER BY s.ts DESC, s.value DESC LIMIT 1), 2) AS signup_value
FROM events e
WHERE e.event_type = 'error'
ORDER BY e.event_id
"""


def q160_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q06's NEAREST sibling: for each error event, the closest signup
    by the same user in EITHER time direction, ties to the prior one —
    pandas.merge_asof(direction='nearest') semantics, which backward
    as-of cannot express (a user whose only signup comes after their
    error gets NULL from q06 and the right answer here). Same
    union-tag machinery, both window frames over ONE key shuffle
    (operators/relational.asof_join(direction='nearest'))."""
    events = _t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        errors, signups, on="user_id", left_time="ts", right_time="ts",
        right_values=["value"], direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_ts").alias("signup_ts"),
        F.round("asof_value", 2).alias("signup_value"),
    ).orderBy("event_id")


# Distance compare in exact integer microseconds on BOTH engines
# (epoch_us here, unix_micros in the operator) — review simulation
# showed double epoch-seconds flip ~25% of exact-distance ties on
# microsecond-payload data. Equal distance -> the prior signup,
# matching the operator's merge_asof tie convention.
_Q160_SQL = """
WITH err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
sc AS (
  SELECT e.event_id, e.user_id, e.ts,
    (SELECT max(s.ts) FROM events s
     WHERE s.event_type = 'signup' AND s.user_id = e.user_id
       AND s.ts <= e.ts) AS bts,
    (SELECT s.value FROM events s
     WHERE s.event_type = 'signup' AND s.user_id = e.user_id
       AND s.ts <= e.ts
     ORDER BY s.ts DESC, s.value DESC LIMIT 1) AS bv,
    (SELECT min(s.ts) FROM events s
     WHERE s.event_type = 'signup' AND s.user_id = e.user_id
       AND s.ts >= e.ts) AS fts,
    (SELECT s.value FROM events s
     WHERE s.event_type = 'signup' AND s.user_id = e.user_id
       AND s.ts >= e.ts
     ORDER BY s.ts ASC, s.value ASC LIMIT 1) AS fv
  FROM err e)
SELECT event_id, user_id,
       CASE WHEN bts IS NULL THEN fts
            WHEN fts IS NULL THEN bts
            WHEN epoch_us(fts) - epoch_us(ts) < epoch_us(ts) - epoch_us(bts)
              THEN fts ELSE bts END AS signup_ts,
       round(CASE WHEN bts IS NULL THEN fv
                  WHEN fts IS NULL THEN bv
                  WHEN epoch_us(fts) - epoch_us(ts) < epoch_us(ts) - epoch_us(bts)
                    THEN fv ELSE bv END, 2) AS signup_value
FROM sc
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# T16 — rollup / cube. NULL group markers are coalesced to 'ALL' so the
# encoding is engine-independent (fixture keys are never null).
# ---------------------------------------------------------------------------


def q07_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


_Q07_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def q08_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
        .orderBy("status", "priority")
    )


_Q08_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


# ---------------------------------------------------------------------------
# T18 — ordered group-concat (the reference's continuation-row merge
# aggregation shape, handlers/kyrgyzstan.py:183-217). collect_list gives
# no ordering guarantee across partitions, so the order is imposed
# explicitly with array_sort — deterministic under any physical plan.
# ---------------------------------------------------------------------------


def q09_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                ",",
                # numeric sort, then one NATIVE array<string> cast —
                # the element-wise transform(x -> cast) lambda is a
                # higher-order function (interpreted CodegenFallback,
                # r13); the array cast emits identical strings
                F.array_sort(F.collect_list("l_linenumber")).cast(
                    "array<string>"
                ),
            ).alias("linenumbers"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_orderkey")
    )


_Q09_SQL = """
SELECT l_orderkey,
       string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS linenumbers,
       count(*) AS n_items
FROM lineitem
GROUP BY l_orderkey
ORDER BY l_orderkey
"""


# ---------------------------------------------------------------------------
# T20/T25 — ranking window + top-k per group.
# ---------------------------------------------------------------------------


def q10_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    top = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return top.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.col("rk").cast("int").alias("rk"),
    ).orderBy("o_custkey", "rk")


_Q10_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, CAST(rk AS INT) AS rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders)
WHERE rk <= 3
ORDER BY o_custkey, rk
"""


# ---------------------------------------------------------------------------
# T21 — analytic window (lag).
# ---------------------------------------------------------------------------


def q11_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        events.withColumn("prev_value", F.lag("value").over(w))
        .select(
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
            F.round("prev_value", 2).alias("prev_value"),
            F.round(F.col("value") - F.col("prev_value"), 2).alias("delta"),
        )
        .orderBy("event_id")
    )


_Q11_SQL = """
SELECT event_id, user_id,
       round(value, 2) AS value,
       round(prev_value, 2) AS prev_value,
       round(value - prev_value, 2) AS delta
FROM (
  SELECT event_id, user_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
  FROM events)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# T22 — framed aggregate: per-customer running order total.
# ---------------------------------------------------------------------------


def q12_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.withColumn("running_total", F.round(F.sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    )


_Q12_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
"""


# ---------------------------------------------------------------------------
# T23 — sessionization (sum-of-flags group id).
# ---------------------------------------------------------------------------


def q13_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    sess = sessionize(events, key="user_id", ts="ts", gap_seconds=1800)
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


_Q13_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM flagged
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# T24/T25 — global top-k with deterministic tiebreak. Spark executes
# orderBy+limit as TakeOrderedAndProject: per-partition top-k then a
# single k-row merge — no global sort materialization at any scale.
# ---------------------------------------------------------------------------


def q14_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


_Q14_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# T26 — set operations (set semantics on both engines).
# ---------------------------------------------------------------------------


def _custkeys_in_year(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
    ).select("o_custkey")


def q15_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _custkeys_in_year(spark, sf_dir, 1997)
    b = _custkeys_in_year(spark, sf_dir, 1998)
    return a.intersect(b).orderBy("o_custkey")


_Q15_SQL = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
ORDER BY o_custkey
"""


def q16_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _custkeys_in_year(spark, sf_dir, 1997)
    b = _custkeys_in_year(spark, sf_dir, 1998)
    return a.subtract(b).orderBy("o_custkey")


_Q16_SQL = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
ORDER BY o_custkey
"""


# ---------------------------------------------------------------------------
# T15 (pivot shape) — per-user event-type counts as fixed columns.
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q17_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    pivoted = (
        events.groupBy("user_id").pivot("event_type", _EVENT_TYPES).agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}") for t in _EVENT_TYPES],
    ).orderBy("user_id")


_Q17_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# T14 — row-index attach under a declared total order.
# ---------------------------------------------------------------------------


def q18_row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return attach_row_index(docs, ["doc_id"]).orderBy("doc_id")


_Q18_SQL = """
SELECT doc_id, source,
       CAST(row_number() OVER (ORDER BY doc_id) - 1 AS INT) AS row_idx
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# T17 — distinct counting: exact (value-oracle-checked) and sketch-based
# (approx_count_distinct / percentile_approx — HLL/KLL sketches have no
# cross-engine-identical result, so q26 carries a *bounds* oracle: the
# hash covers the exact distinct counts plus booleans asserting each
# sketch landed inside its documented accuracy guarantee).
# ---------------------------------------------------------------------------


def q19_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


_Q19_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_partkey)  AS n_parts,
       count(*)                   AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q26_approx_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates with a *bounds* oracle: HLL++ distinct counts
    and approximate percentiles — the 100 TB path where exact distinct
    would shuffle every raw key.

    Sketch values have no cross-engine-identical form, so the oracle
    contract is the documented accuracy guarantee instead of the value:
    the Spark side computes both the sketch AND the exact statistic in
    one grouped aggregate and emits boolean ``*_ok`` columns
    (``|approx − exact| ≤ ε(exact)``); DuckDB computes the same exact
    distinct count and asserts the booleans as ``TRUE`` literals.  The
    value-hash therefore fails unless every sketch really lands inside
    its guarantee: HLL++ at rsd=0.02 checked at 3σ (±6%), and the
    accuracy=10000 percentiles checked against generous exact rank
    brackets ([0.45,0.55] for p50, [0.93,0.97] for p95) — rank error
    1e-4 is sub-row at test SFs, so the bracket, not the point value,
    is the portable contract.  Exact percentiles for the bracket are
    computed Spark-side only (they never cross engines, so float
    interpolation differences cannot flake the hash)."""
    li = _t(spark, sf_dir, "lineitem")
    pct = F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000)
    exact_pct = F.expr(
        "percentile(l_extendedprice, array(0.45D, 0.55D, 0.93D, 0.97D))"
    )
    # The exact side runs as TWO aggregations joined on the group key,
    # not one: mixing countDistinct with the buffering percentile
    # aggregate makes Catalyst's distinct rewrite push every row
    # through an Expand (x2-3 row multiplication) INTO the percentile
    # buffers — measured 130 s at 6M rows vs ~8 s split. (At 100 TB
    # only the sketches run at all; the exact side exists to enforce
    # the bounds contract at test scales.)
    sketch_and_pct = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        # Scalar columns, not array<double>: the driver comparator
        # canonicalizes cell values by hashing and chokes on lists.
        F.element_at(pct, 1).alias("p50"),
        F.element_at(pct, 2).alias("p95"),
        F.element_at(exact_pct, 1).alias("lo50"),
        F.element_at(exact_pct, 2).alias("hi50"),
        F.element_at(exact_pct, 3).alias("lo95"),
        F.element_at(exact_pct, 4).alias("hi95"),
    )
    exact_distinct = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders")
    )
    agg = sketch_and_pct.join(exact_distinct, "l_returnflag")
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= 3 * 0.02 * F.col("exact_orders")
        ).alias("orders_ok"),
        F.col("p50").between(F.col("lo50"), F.col("hi50")).alias("p50_ok"),
        F.col("p95").between(F.col("lo95"), F.col("hi95")).alias("p95_ok"),
    ).orderBy("l_returnflag")


_Q26_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS orders_ok,
       TRUE AS p50_ok,
       TRUE AS p95_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# T2 — header promotion as an oracle-checked query: build an un-headered
# table from documents (row 0 = header with a '/' needing repair, row 1
# = prolog junk), promote, and compare against the directly-projected
# oracle.
# ---------------------------------------------------------------------------


def q25_header_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.transforms import promote_headers

    docs = _t(spark, sf_dir, "documents")
    raw = docs.select(
        F.col("doc_id").alias("idx"),
        F.when(F.col("doc_id") == 0, F.lit("источник/канал"))
        .when(F.col("doc_id") == 1, F.lit("prolog"))
        .otherwise(F.col("source"))
        .alias("c1"),
        F.when(F.col("doc_id") == 0, F.lit("язык  документа"))
        .when(F.col("doc_id") == 1, F.lit("junk"))
        .otherwise(F.col("lang"))
        .alias("c2"),
    )
    return promote_headers(raw, "idx", skip_rows=2, repair=True).orderBy("idx")


_Q25_SQL = """
SELECT doc_id AS idx,
       source AS "источник или канал",
       lang   AS "язык документа"
FROM documents
WHERE doc_id >= 2
ORDER BY idx
"""


# ---------------------------------------------------------------------------
# SQL surface — the engine's query language is Spark SQL over the
# registered catalog views (SURVEY §3.4: no custom parser; Catalyst
# produces the same plan as the DataFrame API). One query runs through
# spark.sql end-to-end to pin that surface.
# ---------------------------------------------------------------------------


def q27_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*)                        AS n_orders,
               round(sum(o_totalprice), 2)     AS total,
               CAST(max(rk) AS BIGINT)         AS max_orders_per_cust
        FROM (
          SELECT o.o_custkey, o.o_totalprice, c.c_mktsegment,
                 row_number() OVER (PARTITION BY o.o_custkey
                                    ORDER BY o.o_orderdate, o.o_orderkey) AS rk
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


_Q27_SQL = """
SELECT c_mktsegment,
       count(*)                    AS n_orders,
       round(sum(o_totalprice), 2) AS total,
       CAST(max(rk) AS BIGINT)     AS max_orders_per_cust
FROM (
  SELECT o.o_custkey, o.o_totalprice, c.c_mktsegment,
         row_number() OVER (PARTITION BY o.o_custkey
                            ORDER BY o.o_orderdate, o.o_orderkey) AS rk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# R30 — log-redaction projection (long values elided to head ... tail).
# ---------------------------------------------------------------------------


def q28_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.transforms.text import redact_long_col

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", redact_long_col(F.col("text"), 100, 50).alias("redacted")
    ).orderBy("doc_id")


_Q28_SQL = """
SELECT doc_id,
       CASE WHEN length(text) > 100
            THEN substr(text, 1, 50) || ' ... '
                 || substr(text, length(text) - 49, 50)
            ELSE text END AS redacted
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Skew pattern — salted two-phase aggregation. events.user_id has only
# 15 distinct values: a direct groupBy lands all rows on 15 reducers no
# matter the cluster size. Phase 1 aggregates on (key, salt) spreading
# each hot key over N partitions; phase 2 combines the N partials.
# Result provably identical to the direct groupBy (oracle-checked).
# ---------------------------------------------------------------------------


def q29_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    salted = events.withColumn("__salt", (F.col("event_id") % 16).cast("int"))
    partial = salted.groupBy("user_id", "__salt").agg(
        F.count(F.lit(1)).alias("pc"), F.sum("value").alias("ps")
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("pc").alias("n_events"),
            F.round(F.sum("ps"), 2).alias("sum_value"),
        )
        .orderBy("user_id")
    )


_Q29_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# T22 (range frames) — interval-bounded moving aggregate: per-user
# 6-hour moving sum/count over event time. Complements q12's row-frame
# running sum: RANGE frames include all value-peers and express
# "trailing N hours" independent of event density.
# ---------------------------------------------------------------------------


def q71_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    events = _t(spark, sf_dir, "events")
    hours6 = 6 * 3600 * 1_000_000  # microseconds
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-hours6, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 2).alias("sum_6h"),
        F.count(F.lit(1)).over(w).alias("n_6h"),
    ).orderBy("event_id")


_Q71_SQL = """
SELECT event_id, user_id, ts,
       round(sum(value) OVER w, 2) AS sum_6h,
       count(*) OVER w AS n_6h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Latest-wins upsert (MERGE INTO / SCD-1 as a batch operator): a
# deterministic update batch (10%-repriced orders) merged over the base
# table; highest version per key survives.
# ---------------------------------------------------------------------------


def q72_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.relational import upsert_latest

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    base = orders.withColumn("version", F.lit(0))
    # Reprice in exact DECIMAL arithmetic: round(double * 1.1, 2) is a
    # half-boundary trap (Spark rounds the shortest decimal repr,
    # DuckDB the binary value — they disagree on e.g. 283256.85 * 1.1).
    reprice = (
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("1.1").cast("decimal(3,2)"),
            2,
        )
    ).cast("double")
    updates = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", reprice)
        .withColumn("version", F.lit(1))
    )
    return upsert_latest(base, updates, ["o_orderkey"], "version").orderBy(
        "o_orderkey"
    )


_Q72_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
         0 AS version
  FROM orders),
updates AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))
                    * CAST(1.1 AS DECIMAL(3,2)), 2) AS DOUBLE) AS o_totalprice,
         1 AS version
  FROM orders WHERE o_orderkey % 7 = 0),
merged AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates))
SELECT o_orderkey, o_custkey, o_totalprice, version
FROM merged WHERE rn = 1
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# SCD-2 history build (the type-2 companion to q72's type-1 upsert):
# each customer's order stream is a change log of their order priority;
# collapse it into validity intervals. Both windows partition on the
# entity key, so the whole build is one key shuffle + per-key sorts —
# the warehouse-standard dimension-history pattern at any scale.
# ---------------------------------------------------------------------------


def q91_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.relational import scd2_history

    changelog = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    return scd2_history(
        changelog,
        key_cols=["o_custkey"],
        attr_cols=["o_orderpriority"],
        ts_col="o_orderdate",
        tiebreak_cols=["o_orderkey"],
    ).orderBy("o_custkey", "effective_from", "o_orderpriority")


_Q91_SQL = """
WITH flagged AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         lag(o_orderpriority) OVER w AS prev_attr,
         lag(o_orderdate) OVER w AS prev_ts
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
versions AS (
  SELECT * FROM flagged
  WHERE prev_ts IS NULL OR prev_attr IS DISTINCT FROM o_orderpriority),
intervals AS (
  SELECT o_custkey, o_orderpriority,
         o_orderdate AS effective_from,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey)
           AS effective_to
  FROM versions)
SELECT o_custkey, o_orderpriority, effective_from, effective_to,
       effective_to IS NULL AS is_current
FROM intervals
ORDER BY o_custkey, effective_from, o_orderpriority
"""


# ---------------------------------------------------------------------------
# Bucketed co-located fact⋈fact join: both sides persisted hash-bucketed
# on the join key, so the join itself needs NO exchange — the shuffle is
# paid once at write time and amortized over every later query. The one
# Exchange left in the plan belongs to the 5-row aggregate AFTER the
# join; tests/test_plans.py pins the join subtree exchange-free.
# ---------------------------------------------------------------------------


def q92_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-identical twin of a plain lineitem⋈orders revenue
    rollup (exactly what the oracle runs); what changes is the physical
    strategy: write-side bucketing makes the fact-fact join shuffle-free
    at read time — the canonical 100 TB layout decision. Table/paths are
    keyed by (fixture dir, pid) so concurrent runs never collide; the
    ``merge`` hint keeps the demo on sort-merge even at tiny SF where
    AQE would otherwise broadcast."""
    import hashlib
    import os
    import tempfile

    from gov_data_pipeline_spark.operators.layout import write_bucketed

    tag = hashlib.md5(f"{sf_dir}|{os.getpid()}".encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), "gdp_bucketed", tag)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    lineitem = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    write_bucketed(
        orders, f"gdp_orders_b_{tag}", ["o_orderkey"], 8,
        path=os.path.join(root, "orders"), mode="overwrite",
    )
    write_bucketed(
        lineitem, f"gdp_lineitem_b_{tag}", ["l_orderkey"], 8,
        path=os.path.join(root, "lineitem"), mode="overwrite",
    )
    o = spark.table(f"gdp_orders_b_{tag}").hint("merge")
    li = spark.table(f"gdp_lineitem_b_{tag}").hint("merge")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_Q92_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Skew-safe salted join: value-identical to the plain customer⋈orders
# equi-join (which is exactly what the oracle runs) but each customer
# key's rows scatter over 16 reducers.
# ---------------------------------------------------------------------------


def q73_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.relational import salted_join

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    joined = salted_join(
        orders, customer, ["o_custkey"], salt=16, salt_on=["o_orderkey"]
    )
    return (
        joined.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("c_nationkey")
    )


_Q73_SQL = """
SELECT c.c_nationkey AS c_nationkey, count(*) AS n_orders
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_nationkey
ORDER BY c_nationkey
"""


def q78_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    totals by (status, priority), by status alone, and the grand total —
    but NOT by priority alone, which cube would emit. Uses the
    first-class ``DataFrame.groupingSets`` API (Spark 4.0+)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
        .orderBy("status", "priority")
    )


_Q78_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
ORDER BY status, priority
"""


def q79_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile binning + percent_rank over order value per priority —
    the distribution-aware window pair (T20 family) used for
    quantile-bucketed sampling and outlier triage."""
    from pyspark.sql.window import Window as W

    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        )
        .filter(F.col("o_orderkey") % 50 == 0)
        .orderBy("o_orderkey")
    )


_Q79_SQL = """
WITH ranked AS (
  SELECT o_orderkey, o_orderpriority,
         ntile(4) OVER w AS quartile,
         round(percent_rank() OVER w, 6) AS pct_rank
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice ASC, o_orderkey ASC))
SELECT o_orderkey, o_orderpriority, CAST(quartile AS INT) AS quartile, pct_rank
FROM ranked
WHERE o_orderkey % 50 = 0
ORDER BY o_orderkey
"""



# ---------------------------------------------------------------------------
# q125 — heavy-hitter key diagnosis (pre-salting skew report).
# ---------------------------------------------------------------------------


def q125_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The report an engineer runs BEFORE reaching for q29/q73's salted
    shapes: the top-10 heaviest join keys on orders.o_custkey with each
    key's share of the table — a key above a few percent is the one
    that stalls a reducer at 100 TB. One count aggregate (key-sized),
    a 1-row total broadcast back, and a top-k window over keys, never
    rows. Share is an exact integer ratio, so both engines round the
    identical double.
    """
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    w = W.partitionBy(F.lit(1)).orderBy(F.col("n").desc(), "o_custkey")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 10)
        .crossJoin(F.broadcast(total))
        .select(
            "rk",
            "o_custkey",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
        .orderBy("rk")
    )


_Q125_SQL = """
WITH counts AS (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey),
t AS (SELECT sum(n) AS total FROM counts),
ranked AS (
  SELECT o_custkey, n,
         row_number() OVER (ORDER BY n DESC, o_custkey) AS rk
  FROM counts)
SELECT CAST(r.rk AS INT) AS rk, r.o_custkey, r.n,
       round(r.n / t.total, 6) AS share
FROM ranked r CROSS JOIN t
WHERE r.rk <= 10
ORDER BY r.rk
"""

QUERIES = {
    "q125_heavy_hitters": q125_heavy_hitters,
    "q01_pricing_summary": q01_pricing_summary,
    "q71_range_window": q71_range_window,
    "q78_grouping_sets": q78_grouping_sets,
    "q79_ntile": q79_ntile,
    "q72_upsert_latest": q72_upsert_latest,
    "q91_scd2_history": q91_scd2_history,
    "q92_bucketed_join": q92_bucketed_join,
    "q73_salted_join": q73_salted_join,
    "q02_revenue_by_nation": q02_revenue_by_nation,
    "q03_semi_join": q03_semi_join,
    "q04_anti_join": q04_anti_join,
    "q05_band_join": q05_band_join,
    "q156_interval_overlap": q156_interval_overlap,
    "q160_asof_nearest": q160_asof_nearest,
    "q06_asof_join": q06_asof_join,
    "q07_rollup": q07_rollup,
    "q08_cube": q08_cube,
    "q09_group_concat": q09_group_concat,
    "q10_window_rank": q10_window_rank,
    "q11_window_lag": q11_window_lag,
    "q12_running_sum": q12_running_sum,
    "q13_sessionize": q13_sessionize,
    "q14_topk_orders": q14_topk_orders,
    "q15_intersect": q15_intersect,
    "q16_except": q16_except,
    "q17_pivot": q17_pivot,
    "q18_row_index": q18_row_index,
    "q19_count_distinct": q19_count_distinct,
    "q25_header_promotion": q25_header_promotion,
    "q26_approx_agg": q26_approx_agg,
    "q27_sql_api": q27_sql_api,
    "q28_redact": q28_redact,
    "q29_salted_agg": q29_salted_agg,
}

ORACLE = {
    "q125_heavy_hitters": _Q125_SQL,
    "q01_pricing_summary": _Q01_SQL,
    "q71_range_window": _Q71_SQL,
    "q78_grouping_sets": _Q78_SQL,
    "q79_ntile": _Q79_SQL,
    "q72_upsert_latest": _Q72_SQL,
    "q91_scd2_history": _Q91_SQL,
    "q92_bucketed_join": _Q92_SQL,
    "q73_salted_join": _Q73_SQL,
    "q02_revenue_by_nation": _Q02_SQL,
    "q03_semi_join": _Q03_SQL,
    "q04_anti_join": _Q04_SQL,
    "q05_band_join": _Q05_SQL,
    "q156_interval_overlap": _Q156_SQL,
    "q160_asof_nearest": _Q160_SQL,
    "q06_asof_join": _Q06_SQL,
    "q07_rollup": _Q07_SQL,
    "q08_cube": _Q08_SQL,
    "q09_group_concat": _Q09_SQL,
    "q10_window_rank": _Q10_SQL,
    "q11_window_lag": _Q11_SQL,
    "q12_running_sum": _Q12_SQL,
    "q13_sessionize": _Q13_SQL,
    "q14_topk_orders": _Q14_SQL,
    "q15_intersect": _Q15_SQL,
    "q16_except": _Q16_SQL,
    "q17_pivot": _Q17_SQL,
    "q18_row_index": _Q18_SQL,
    "q19_count_distinct": _Q19_SQL,
    "q25_header_promotion": _Q25_SQL,
    "q26_approx_agg": _Q26_SQL,
    "q27_sql_api": _Q27_SQL,
    "q28_redact": _Q28_SQL,
    "q29_salted_agg": _Q29_SQL,
}
