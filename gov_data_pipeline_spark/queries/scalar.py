"""Scalar function surface (SURVEY T27-T35): string, regex, date, math,
JSON, array (higher-order), map, base64 — all native
``pyspark.sql.functions`` (JVM-side, codegen'd; zero Python in the hot
path), each with a DuckDB oracle.

Cross-engine tactics used throughout:
- double outputs are rounded in BOTH queries (ulp-safety);
- integer-ish outputs are cast to BIGINT on both sides (DuckDB promotes
  int sums to HUGEINT, Spark's floor/ceil return LONG while DuckDB's
  return DOUBLE);
- summations over arrays run element-ordered on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gov_data_pipeline_spark.catalog import read_table as _t


# ---------------------------------------------------------------------------
# T27 — string functions.
# ---------------------------------------------------------------------------


def q30_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_type").cast("bigint").alias("type_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
    ).orderBy("p_partkey")


_Q30_SQL = """
SELECT p_partkey,
       lower(p_name)                         AS name_lower,
       upper(p_brand)                        AS brand_upper,
       CAST(length(p_type) AS BIGINT)        AS type_len,
       substr(p_name, 1, 8)                  AS name_prefix,
       concat_ws('|', p_brand, p_type)       AS brand_type,
       trim('  ' || p_name || '  ')          AS trimmed,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       reverse(p_brand)                      AS brand_rev,
       repeat('*', CAST(p_size % 5 AS INT))  AS stars
FROM part
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# T28 — regexp_extract / rlike chains (R3's link-scrape shape).
# ---------------------------------------------------------------------------


def q31_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").rlike(r"^[1-3]-"))
        .select(
            "o_orderkey",
            F.regexp_extract("o_orderpriority", r"^(\d+)-(\w+)", 1).alias("prio_num"),
            F.regexp_extract("o_orderpriority", r"^(\d+)-(\w+)", 2).alias("prio_word"),
            F.regexp_replace("o_orderstatus", r"[OF]", "_").alias("status_masked"),
        )
        .orderBy("o_orderkey")
    )


_Q31_SQL = r"""
SELECT o_orderkey,
       regexp_extract(o_orderpriority, '^(\d+)-(\w+)', 1) AS prio_num,
       regexp_extract(o_orderpriority, '^(\d+)-(\w+)', 2) AS prio_word,
       regexp_replace(o_orderstatus, '[OF]', '_', 'g')    AS status_masked
FROM orders
WHERE regexp_matches(o_orderpriority, '^[1-3]-')
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# T31 — date functions (R26's strftime generalized).
# ---------------------------------------------------------------------------


def q32_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_95"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias("due_date"),
    ).orderBy("o_orderkey")


_Q32_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)    AS yr,
       CAST(month(o_orderdate) AS BIGINT)   AS mo,
       CAST(day(o_orderdate) AS BIGINT)     AS dom,
       date_trunc('month', o_orderdate)     AS month_start,
       strftime(o_orderdate, '%Y-%m-%d')    AS order_day,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
                                            AS days_since_95,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# T32 — math functions.
# ---------------------------------------------------------------------------


def q33_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
        F.round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
    ).orderBy("l_orderkey", "l_linenumber")


_Q33_SQL = """
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - 0.05), 6)          AS abs_disc,
       CAST(floor(l_extendedprice) AS BIGINT)    AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT)     AS price_ceil,
       round(sqrt(l_quantity), 6)                AS qty_sqrt,
       round(ln(l_extendedprice), 6)             AS price_ln,
       CAST(l_orderkey % 7 AS BIGINT)            AS key_mod,
       round(pow(l_discount, 2), 6)              AS disc_sq
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------------------
# T33 — JSON access on events.props (R23's JSON-parse generalized).
# ---------------------------------------------------------------------------


def q34_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.withColumn("k_val", k)
        .groupBy((F.col("k_val") % 10).cast("bigint").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max("k_val").cast("bigint").alias("max_k"),
        )
        .orderBy("k_bucket")
    )


_Q34_SQL = """
SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY 1
ORDER BY k_bucket
"""


# ---------------------------------------------------------------------------
# T34 — array higher-order functions over embeddings (the dot-product
# building blocks of L7). Element-ordered aggregation on both engines.
# ---------------------------------------------------------------------------


def q35_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x)), 4).alias("l2_norm"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.size("embedding"),
            6,
        ).alias("mean_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_positive"),
    ).orderBy("vec_id")


_Q35_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(sqrt(list_sum(list_transform(embedding,
                                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)
         AS l2_norm,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / len(embedding), 6)
         AS mean_val,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# T35 — map functions: literal weight map, element_at lookup.
# ---------------------------------------------------------------------------

_WEIGHTS = {"click": 1, "view": 2, "purchase": 5, "signup": 3, "error": 0}


def q36_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    pairs: list = []
    for k, v in _WEIGHTS.items():
        pairs += [F.lit(k), F.lit(v)]
    weights = F.create_map(*pairs)
    return (
        events.withColumn("w", F.element_at(weights, F.col("event_type")))
        .groupBy("user_id")
        .agg(
            F.sum("w").cast("bigint").alias("weighted_events"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


_Q36_SQL = """
SELECT user_id,
       CAST(sum(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                WHEN 'purchase' THEN 5 WHEN 'signup' THEN 3 WHEN 'error' THEN 0
                END) AS BIGINT) AS weighted_events,
       count(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# T30 — base64/unbase64 (R29's data-URI codec, minus PIL transcode).
# ---------------------------------------------------------------------------


def q37_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    head = F.substring("text", 1, 16)
    b64 = F.base64(F.encode(head, "UTF-8"))
    return docs.select(
        "doc_id",
        b64.alias("b64"),
        F.concat(F.lit("data:text/plain;base64,"), b64).alias("data_uri"),
        F.decode(F.unbase64(b64), "UTF-8").alias("roundtrip"),
    ).orderBy("doc_id")


_Q37_SQL = """
SELECT doc_id,
       base64(encode(substr(text, 1, 16))) AS b64,
       'data:text/plain;base64,' || base64(encode(substr(text, 1, 16))) AS data_uri,
       substr(text, 1, 16) AS roundtrip
FROM documents
ORDER BY doc_id
"""


QUERIES = {
    "q30_string_funcs": q30_string_funcs,
    "q31_regex": q31_regex,
    "q32_dates": q32_dates,
    "q33_math": q33_math,
    "q34_json": q34_json,
    "q35_array": q35_array,
    "q36_map": q36_map,
    "q37_base64": q37_base64,
}

ORACLE = {
    "q30_string_funcs": _Q30_SQL,
    "q31_regex": _Q31_SQL,
    "q32_dates": _Q32_SQL,
    "q33_math": _Q33_SQL,
    "q34_json": _Q34_SQL,
    "q35_array": _Q35_SQL,
    "q36_map": _Q36_SQL,
    "q37_base64": _Q37_SQL,
}
