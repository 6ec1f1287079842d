"""Corpus-quality queries: PII scrubbing and statistical outlier
gating — the data-hygiene passes a training-data pipeline runs between
ingestion and dedup (SURVEY §2.2 L8's quality family, extended).

Both queries are pure projections / one tiny aggregate, so their plans
are scan → codegen'd expressions (+ one broadcast of per-class stats
for q93): nothing here shuffles document bytes, which is the property
that matters at 100 TB.

The fixtures carry no real PII, so q90 synthesizes deterministic
contact strings from fixture columns inside the query — both engines
build the identical messy string, then scrub it (the q20-q24 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gov_data_pipeline_spark.catalog import read_table as _t
from gov_data_pipeline_spark.functions.pii import pii_count_col, pii_redact_col
from gov_data_pipeline_spark.util import pin_partitioned


# ---------------------------------------------------------------------------
# q90 — PII redaction (email / card / phone / IPv4), counts per class.
# ---------------------------------------------------------------------------


def _messy_text(doc_id, text):
    """Deterministic PII injection both engines replicate: an email and
    a phone on every row, an IPv4 on every 2nd, a card on every 3rd."""
    return F.concat(
        text,
        F.lit(" contact user"), doc_id.cast("string"),
        F.lit("@mail.example.org tel +375 29 "),
        F.lpad((doc_id % 10000000).cast("string"), 7, "0"),
        F.when(
            doc_id % 2 == 0,
            F.concat(
                F.lit(" ip 10."), (doc_id % 256).cast("string"),
                F.lit(".0."), ((doc_id * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 3 == 0,
            F.concat(
                F.lit(" card 4111 1111 1111 "),
                F.lpad((doc_id % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )


def q90_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts are taken per class on the ORIGINAL text (so overlapping
    classes each report their raw matches — a card's leading digits
    also count as one phone match); the redaction chain then applies
    in the fixed order email → card → phone → IPv4 (see
    ``functions/pii.py`` for why that order makes the output
    order-independent)."""
    docs = _t(spark, sf_dir, "documents")
    messy = _messy_text(F.col("doc_id"), F.col("text"))
    return (
        docs.select(
            "doc_id",
            pii_redact_col(messy).alias("redacted"),
            pii_count_col(messy, "email").alias("n_email"),
            pii_count_col(messy, "card").alias("n_card"),
            pii_count_col(messy, "phone").alias("n_phone"),
            pii_count_col(messy, "ipv4").alias("n_ipv4"),
        )
        .orderBy("doc_id")
    )


# The RE2 mirror of functions/pii.PII_PATTERNS — same patterns, same
# application order, 'g' flag because DuckDB's regexp_replace is
# first-match-only by default (Spark's replaces all).
_MESSY_SQL = """
text || ' contact user' || doc_id::VARCHAR || '@mail.example.org tel +375 29 '
     || lpad((doc_id % 10000000)::VARCHAR, 7, '0')
     || CASE WHEN doc_id % 2 = 0
             THEN ' ip 10.' || (doc_id % 256)::VARCHAR || '.0.'
                  || ((doc_id * 7) % 256)::VARCHAR
             ELSE '' END
     || CASE WHEN doc_id % 3 = 0
             THEN ' card 4111 1111 1111 ' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             ELSE '' END
"""

_Q90_SQL = rf"""
WITH m AS (SELECT doc_id, {_MESSY_SQL} AS messy FROM documents)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(messy,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
             '\b\d{{4}}[ -]?\d{{4}}[ -]?\d{{4}}[ -]?\d{{4}}\b', '[CARD]', 'g'),
           '\+?\d(?:[ -]?\d){{8,13}}', '[PHONE]', 'g'),
         '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b', '[IP]', 'g') AS redacted,
       len(regexp_extract_all(messy,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS n_email,
       len(regexp_extract_all(messy,
         '\b\d{{4}}[ -]?\d{{4}}[ -]?\d{{4}}[ -]?\d{{4}}\b')) AS n_card,
       len(regexp_extract_all(messy,
         '\+?\d(?:[ -]?\d){{8,13}}')) AS n_phone,
       len(regexp_extract_all(messy,
         '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b')) AS n_ipv4
FROM m
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q93 — per-class z-score outlier gate over events.value.
# ---------------------------------------------------------------------------


def q93_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type mean/stddev via a tiny groupBy (5 classes),
    broadcast back onto the stream — the scale shape: full-table
    stats are one map-side-combined aggregate producing a handful of
    rows, and the gate itself is then a broadcast-joined projection,
    never a per-class window sort over the whole table.

    Filter and output both use the 4-decimal-ROUNDED z (the q46
    convention): cross-engine float aggregation can differ by ulps,
    and rounding before comparing keeps both engines on the same side
    of the threshold."""
    events = _t(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("__m"), F.stddev_samp("value").alias("__sd")
    )
    # try_divide: a degenerate class (constant values -> sd = 0, or a
    # single row -> sd = NULL) must null its z and drop at the filter,
    # not throw DIVIDE_BY_ZERO under ANSI mode (the cosine() contract);
    # the oracle's sd = 0 guard mirrors it.
    z = F.round(
        F.try_divide(F.col("value") - F.col("__m"), F.col("__sd")), 4
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) >= 3.0)
        .orderBy("event_id")
    )


_Q93_SQL = """
WITH s AS (
  SELECT event_type, avg(value) AS m,
         nullif(stddev_samp(value), 0) AS sd
  FROM events GROUP BY event_type)
SELECT event_id, e.event_type, value,
       round((value - m) / sd, 4) AS z
FROM events e JOIN s ON s.event_type = e.event_type
WHERE abs(round((value - m) / sd, 4)) >= 3.0
ORDER BY event_id
"""



# ---------------------------------------------------------------------------
# q122 — k-anonymity audit over quasi-identifiers.
# ---------------------------------------------------------------------------


def q122_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-release audit: treat (lang, source, size-band) as the
    quasi-identifier tuple and report, per language, how many
    equivalence classes fall below k=5 and how many rows sit in them —
    the rows a k-anonymous release must suppress or generalize.
    Pure-integer bucketing (n_chars // 500) and counts, so the engines
    cannot diverge; two hash aggregates over one scan, the second over
    class-sized data.
    """
    # floor, not a bare int cast: DuckDB's CAST(double AS INT) rounds
    # half-up while Spark's truncates — floor() pins both engines
    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 500).cast("int").alias("size_band"),
    )
    classes = docs.groupBy("lang", "source", "size_band").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        classes.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.when(F.col("n") < 5, 1).otherwise(0)).alias(
                "n_small_classes"
            ),
            F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0)).alias(
                "n_rows_at_risk"
            ),
            F.min("n").alias("min_class_size"),
        )
        .orderBy("lang")
    )


_Q122_SQL = """
WITH classes AS (
  SELECT lang, source, CAST(floor(n_chars / 500) AS INT) AS size_band,
         count(*) AS n
  FROM documents
  GROUP BY lang, source, size_band)
SELECT lang,
       count(*) AS n_classes,
       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       min(n) AS min_class_size
FROM classes
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# q128 — declarative expectations report (the ingest contract gate).
# ---------------------------------------------------------------------------


def q128_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract-test the lineitem ingest: five row-level expectations
    evaluated in ONE conditional aggregate over one scan, plus a
    referential-integrity check against orders (left-anti on the key),
    emitted as a uniform (check, n_rows, n_violations, pass_rate)
    report — what a production pipeline publishes to its quality
    dashboard after every load. NULL verdicts count as violations
    (strict posture, identical CASE semantics in both engines).
    """
    from gov_data_pipeline_spark.operators.expect import (
        expectations_report,
        fk_violation_count,
    )

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    report = expectations_report(
        li,
        [
            ("discount_in_range", F.col("l_discount").between(0.0, 0.1)),
            ("price_positive", F.col("l_extendedprice") > 0),
            ("qty_in_range", F.col("l_quantity").between(1, 50)),
            ("returnflag_enum", F.col("l_returnflag").isin("A", "N", "R")),
            ("shipdate_not_null", F.col("l_shipdate").isNotNull()),
        ],
    )
    n_li = li.agg(F.count(F.lit(1)).alias("n_rows"))
    fk = (
        fk_violation_count(li, orders, "l_orderkey", "o_orderkey")
        .crossJoin(F.broadcast(n_li))
        .select(
            F.lit("fk_orderkey_in_orders").alias("check"),
            "n_rows",
            "n_violations",
            F.round(
                (F.col("n_rows") - F.col("n_violations")) / F.col("n_rows"), 6
            ).alias("pass_rate"),
        )
    )
    return report.unionByName(fk).orderBy("check")


_Q128_SQL = """
WITH row_checks AS (
  SELECT count(*) AS n_rows,
         sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 0 ELSE 1 END)
           AS v_discount,
         sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS v_price,
         sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS v_qty,
         sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END)
           AS v_flag,
         sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS v_ship
  FROM lineitem),
fk AS (
  SELECT count(*) AS n_violations FROM lineitem l
  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NULL),
rows_out AS (
  SELECT 'discount_in_range' AS "check", n_rows, v_discount AS n_violations
  FROM row_checks
  UNION ALL SELECT 'price_positive', n_rows, v_price FROM row_checks
  UNION ALL SELECT 'qty_in_range', n_rows, v_qty FROM row_checks
  UNION ALL SELECT 'returnflag_enum', n_rows, v_flag FROM row_checks
  UNION ALL SELECT 'shipdate_not_null', n_rows, v_ship FROM row_checks
  UNION ALL
  SELECT 'fk_orderkey_in_orders', (SELECT n_rows FROM row_checks),
         n_violations FROM fk)
SELECT "check", n_rows, CAST(n_violations AS BIGINT) AS n_violations,
       round((n_rows - n_violations) / n_rows, 6) AS pass_rate
FROM rows_out
ORDER BY "check"
"""

# ---------------------------------------------------------------------------
# q164 — learned quality filter: hashed-feature linear model scoring
# (operators/scoring.score_linear_model), the fastText/CCNet-shaped
# step after the heuristic signals (q47/q93). Model-as-a-table: the
# deterministic pseudo-weights table (262 144 features, md5-derived
# milli-unit weights both engines rebuild bit-identically) broadcasts
# into an explode → hash → join → sum plan with zero Python. Logits
# are exact int64 sums, so the oracle hashes every logit, not a
# tolerance band.
# ---------------------------------------------------------------------------

_Q164_N_FEATURES = 1 << 18


def q164_quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.scoring import (
        pseudo_weights,
        score_linear_model,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    w = pseudo_weights(spark, n_features=_Q164_N_FEATURES)
    return (
        score_linear_model(
            docs,
            "doc_id",
            F.col("text"),
            w,
            n_features=_Q164_N_FEATURES,
            hash_family="md5",
        )
        .select("doc_id", "logit", "kept")
        .orderBy("doc_id")
    )


_Q164_SQL = """
WITH w AS (
  SELECT range AS feature_id,
         ('0x' || substr(md5(CAST(range AS VARCHAR)), 1, 13))::BIGINT
           % 2001 - 1000 AS weight
  FROM range(262144)),
docs AS (
  SELECT doc_id,
         lower(trim(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')))
           AS canon
  FROM documents),
ws AS (
  SELECT doc_id, string_split(canon, ' ') AS wlist
  FROM docs WHERE len(canon) > 0),
grams AS (
  SELECT doc_id, unnest(wlist) AS g FROM ws
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(wlist)),
                               i -> wlist[i] || ' ' || wlist[i+1])) AS g
  FROM ws WHERE len(wlist) >= 2),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 13))::BIGINT % 262144 AS feature_id,
         count(*) AS tf
  FROM grams GROUP BY 1, 2),
sums AS (
  SELECT f.doc_id, sum(f.tf * w.weight) AS dot
  FROM feats f JOIN w ON w.feature_id = f.feature_id
  GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(s.dot, 0) AS BIGINT) AS logit,
       coalesce(s.dot, 0) >= 0 AS kept
FROM documents d
LEFT JOIN sums s ON s.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# q168 — TRAINED quality filter: the q164 scorer with a model the
# engine itself fits (operators/scoring.train_linear_model — 2
# fixed-point hard-sigmoid gradient iterations over hashed features),
# then scores with. Labels are deterministic from the fixture (does
# the document mention 'spark' — ~77% positive), so both engines see
# the identical training set; every weight update is int64 with
# truncating div, so the DuckDB oracle unrolls the two iterations as
# CTEs and reproduces the trained model — and every downstream logit
# and keep decision — bit-for-bit. Scale shape: feature frame built
# once (one text scan, localCheckpointed); per iteration one broadcast
# model join + one doc-id groupBy + one feature-id groupBy; the model
# never collects to the driver.
# ---------------------------------------------------------------------------


def q168_quality_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.scoring import (
        hashed_token_features,
        score_linear_model,
        train_linear_model,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # ONE corpus explode for train AND score (r13): build the hashed
    # feature frame once, pin it, and hand it to both halves — the old
    # shape re-exploded the corpus for the scorer even though the
    # trainer had just localCheckpointed the identical frame (measured
    # 5.85 s → 2.96 s best-of-5 at sf0.1; at 100 TB this is one full
    # text scan + explode + (id, feature) aggregate deleted).
    #
    # CO-PARTITIONED pin (r14, guide §2.4): the docs are repartitioned
    # by doc_id BEFORE the feature build, so (a) the tf groupBy reuses
    # that one exchange (hash(doc_id) satisfies the (doc_id,
    # feature_id) clustering) — the pin job moves raw text bytes
    # across ONE exchange and gram rows across none — and (b)
    # pin_partitioned captures hash(doc_id) into the checkpoint, so
    # every per-iteration doc-keyed join/aggregate in the trainer and
    # the scorer's doc-id sum plan with ZERO exchanges over the
    # feature relation (the r13 shape re-shuffled it by doc_id four
    # times: iter-1 gradient join, iter-2 z-sum, iter-2 gradient
    # join, scorer sum).
    # OVERLAPPED pins (r14, guide §2.6): the feats pin and the (small,
    # independent) label pin are both eager jobs — submitted
    # sequentially the label job waits out the feature job's straggler
    # tail; on a 2-thread pool its tasks back-fill the freed cores.
    # Job descriptions are thread-local, so each body labels its own.
    from concurrent.futures import ThreadPoolExecutor

    def _build_feats() -> DataFrame:
        spark.sparkContext.setJobDescription("q168: pin feats")
        return pin_partitioned(
            hashed_token_features(
                docs.repartition(F.col("doc_id")),
                "doc_id",
                F.col("text"),
                n_features=_Q164_N_FEATURES,
                hash_family="md5",
            )
        )

    def _build_labels() -> DataFrame:
        spark.sparkContext.setJobDescription("q168: pin labels")
        return pin_partitioned(
            docs.select(
                "doc_id",
                F.col("text").contains("spark").cast("int").alias("label"),
            ),
            "doc_id",
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_feats = pool.submit(_build_feats)
        f_labels = pool.submit(_build_labels)
        feats = f_feats.result()
        labels = f_labels.result()
    spark.sparkContext.setJobDescription(None)
    w = train_linear_model(
        docs,
        "doc_id",
        F.col("text"),
        F.col("text").contains("spark").cast("int"),
        n_features=_Q164_N_FEATURES,
        n_iter=2,
        lr_den=1000,
        hash_family="md5",
        feats=feats,
        labels=labels,
    )
    return (
        score_linear_model(
            docs,
            "doc_id",
            F.col("text"),
            w,
            n_features=_Q164_N_FEATURES,
            hash_family="md5",
            feats=feats,
        )
        .select("doc_id", "logit", "kept")
        .orderBy("doc_id")
    )


_Q168_SQL = """
WITH labeled AS (
  SELECT doc_id, text,
         CASE WHEN text LIKE '%spark%' THEN 1000 ELSE 0 END AS y
  FROM documents),
canon AS (
  SELECT doc_id, y,
         lower(trim(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g'))) AS c
  FROM labeled),
ws AS (
  SELECT doc_id, string_split(c, ' ') AS wlist
  FROM canon WHERE len(c) > 0),
grams AS (
  SELECT doc_id, unnest(wlist) AS g FROM ws
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(wlist)),
                               i -> wlist[i] || ' ' || wlist[i+1])) AS g
  FROM ws WHERE len(wlist) >= 2),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 13))::BIGINT % 262144 AS feature_id,
         count(*) AS tf
  FROM grams GROUP BY 1, 2),
err1 AS (
  SELECT doc_id, 500 - y AS err FROM labeled),
grad1 AS (
  SELECT f.feature_id, CAST(sum(f.tf * e.err) AS BIGINT) AS g
  FROM feats f JOIN err1 e ON e.doc_id = f.doc_id
  GROUP BY 1),
w1 AS (
  SELECT feature_id, -(g // 1000) AS w FROM grad1),
z2 AS (
  SELECT f.doc_id, CAST(sum(f.tf * w1.w) AS BIGINT) AS z
  FROM feats f JOIN w1 ON w1.feature_id = f.feature_id
  GROUP BY 1),
err2 AS (
  SELECT l.doc_id,
         least(1000, greatest(0, 500 + (coalesce(z2.z, 0) // 4))) - l.y
           AS err
  FROM labeled l LEFT JOIN z2 ON z2.doc_id = l.doc_id),
grad2 AS (
  SELECT f.feature_id, CAST(sum(f.tf * e.err) AS BIGINT) AS g
  FROM feats f JOIN err2 e ON e.doc_id = f.doc_id
  GROUP BY 1),
w2 AS (
  SELECT coalesce(w1.feature_id, g2.feature_id) AS feature_id,
         coalesce(w1.w, 0) - (coalesce(g2.g, 0) // 1000) AS w
  FROM w1 FULL OUTER JOIN grad2 g2 ON g2.feature_id = w1.feature_id),
score AS (
  SELECT f.doc_id, CAST(sum(f.tf * w2.w) AS BIGINT) AS z
  FROM feats f JOIN w2 ON w2.feature_id = f.feature_id
  GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(s.z, 0) AS BIGINT) AS logit,
       coalesce(s.z, 0) >= 0 AS kept
FROM documents d
LEFT JOIN score s ON s.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# q173 — multilingual curation capstone: the round-10 unicode surface
# composed as ONE oracle-checked pipeline, the way a multilingual
# corpus run would chain it: script routing (q170's dominant-script
# signal) -> unicode normalized dedup (q169's L5 shape, planted
# variants dropped) -> unicode learned scoring (q167's broadcast
# model) -> one verdict row per document. Every stage is individually
# oracled; this pins the COMPOSITION (the q89/q75 capstone pattern).
# Plan: the corpus derives once, the dedup key is one window over a
# 16-byte md5, the scorer is one explode + broadcast join + one
# doc-id shuffle — nothing here adds a shuffle the stages didn't
# already have.
# ---------------------------------------------------------------------------


def q173_multilingual_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.functions.textstats import (
        dominant_script_col,
        script_counts_chained,
    )
    from gov_data_pipeline_spark.operators.scoring import (
        pseudo_weights,
        score_linear_model,
    )
    from gov_data_pipeline_spark.transforms import canonical_text_col

    _LO = "abcdefghijklmnopqrstuvwxyz"
    base = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.translate(F.col("text"), _LO, "абвгдежзийклмнопрстуфхцчшщ"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    variants = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.concat(
            F.translate(F.col("text"), _LO, _LO.upper()), F.lit(" ?!  .")
        ).alias("text"),
    )
    corpus = base.unionByName(variants)

    t = F.col("text")
    # chained-strip counts (r14): identical values, one full-text scan
    # + two letters-only scans instead of three full-text regex passes
    lat, cyr, han = script_counts_chained(t)
    routed = corpus.select(
        "doc_id", "text", dominant_script_col(lat, cyr, han).alias("dominant")
    )

    from pyspark.sql import Window as W

    wk = W.partitionBy(F.md5(canonical_text_col(t, token_classes="unicode")))
    keyed = routed.withColumn(
        "group_size", F.count(F.lit(1)).over(wk)
    ).withColumn("dedup_keep", F.col("doc_id") == F.min("doc_id").over(wk))

    scored = score_linear_model(
        keyed,
        "doc_id",
        F.col("text"),
        pseudo_weights(spark, n_features=_Q164_N_FEATURES),
        n_features=_Q164_N_FEATURES,
        hash_family="md5",
        token_classes="unicode",
    )
    return (
        scored.select(
            "doc_id",
            "dominant",
            "group_size",
            "dedup_keep",
            "logit",
            (F.col("dedup_keep") & F.col("kept")).alias("final_kept"),
        )
        .orderBy("doc_id")
    )


_Q173_SQL = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN translate(text, 'abcdefghijklmnopqrstuvwxyz',
                             'абвгдежзийклмнопрстуфхцчшщ')
              ELSE text END AS text
  FROM documents),
u AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         translate(text, 'abcdefghijklmnopqrstuvwxyz',
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZ') || ' ?!  .' AS text
  FROM base WHERE doc_id % 5 = 0),
routed AS (
  SELECT doc_id, text,
         CASE WHEN n_latin = 0 AND n_cyrillic = 0 AND n_han = 0 THEN 'none'
              WHEN n_latin >= n_cyrillic AND n_latin >= n_han THEN 'latin'
              WHEN n_cyrillic >= n_han THEN 'cyrillic'
              ELSE 'han' END AS dominant
  FROM (
    SELECT doc_id, text,
           coalesce(len(regexp_extract_all(text, '[A-Za-z]')), 0) AS n_latin,
           coalesce(len(regexp_extract_all(text, '\\p{Cyrillic}')), 0)
             AS n_cyrillic,
           coalesce(len(regexp_extract_all(text, '\\p{Han}')), 0) AS n_han
    FROM u)),
keyed AS (
  SELECT doc_id, text, dominant,
         count(*) OVER (PARTITION BY k) AS group_size,
         doc_id = min(doc_id) OVER (PARTITION BY k) AS dedup_keep
  FROM (
    SELECT *,
           md5(translate(trim(regexp_replace(text, '[^\\p{L}\\p{N}]+', ' ',
                                             'g')),
                         'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         'abcdefghijklmnopqrstuvwxyz')) AS k
    FROM routed)),
w AS (
  SELECT range AS feature_id,
         ('0x' || substr(md5(CAST(range AS VARCHAR)), 1, 13))::BIGINT
           % 2001 - 1000 AS weight
  FROM range(262144)),
canon AS (
  SELECT doc_id,
         translate(trim(regexp_replace(text, '[^\\p{L}\\p{N}]+', ' ', 'g')),
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                   'abcdefghijklmnopqrstuvwxyz') AS c
  FROM u),
ws AS (
  SELECT doc_id, string_split(c, ' ') AS wlist
  FROM canon WHERE len(c) > 0),
grams AS (
  SELECT doc_id, unnest(wlist) AS g FROM ws
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(wlist)),
                               i -> wlist[i] || ' ' || wlist[i+1])) AS g
  FROM ws WHERE len(wlist) >= 2),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 13))::BIGINT % 262144 AS feature_id,
         count(*) AS tf
  FROM grams GROUP BY 1, 2),
sums AS (
  SELECT f.doc_id, sum(f.tf * w.weight) AS dot
  FROM feats f JOIN w ON w.feature_id = f.feature_id
  GROUP BY 1)
SELECT k.doc_id, k.dominant, k.group_size, k.dedup_keep,
       CAST(coalesce(s.dot, 0) AS BIGINT) AS logit,
       k.dedup_keep AND coalesce(s.dot, 0) >= 0 AS final_kept
FROM keyed k
LEFT JOIN sums s ON s.doc_id = k.doc_id
ORDER BY k.doc_id
"""


# ---------------------------------------------------------------------------
# q166 — SUMMARIZE-style column profile (operators/expect.
# profile_columns): per-column row/null/exact-distinct counts and
# string-cast min/max over a mixed-type slice of orders (long, double,
# timestamp, varchar) in ONE aggregate pass — the datasheet that
# expectation suites are written from. The oracle recomputes each
# column independently; the engine side must reshape its single-scan
# wide row into the same long form.
# ---------------------------------------------------------------------------

_Q166_COLS = (
    "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
    "o_totalprice",
)


def q166_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.expect import profile_columns

    orders = _t(spark, sf_dir, "orders")
    return profile_columns(orders, list(_Q166_COLS))


# ---------------------------------------------------------------------------
# q167 — the q164 learned filter on a MULTILINGUAL corpus: the
# ``token_classes="unicode"`` scorer mode (``\p{L}\p{N}`` token
# classes, ASCII-only case fold) over a deterministic Cyrillic variant
# of every 2nd document. The fixture is ASCII-only, so both engines
# derive the same mixed-script corpus in-query (codepoint-1:1
# ``translate`` to Cyrillic — the q90 synthesize-then-process
# pattern). The point this query pins: in ASCII mode those documents
# would produce ZERO features and score the intercept (the round-9
# verdict's gap — the reference's own corpus is Cyrillic,
# /root/reference/handlers/kazakhstan.py:154-179); in unicode mode
# every logit is a real, exact int64 the oracle reproduces
# bit-for-bit. Same plan shape as q164: one explode over one text
# scan, broadcast model, one corpus shuffle.
# ---------------------------------------------------------------------------

_CYR = "абвгдежзийклмнопрстуфхцчшщ"
_LAT = "abcdefghijklmnopqrstuvwxyz"


def q167_quality_linear_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.scoring import (
        pseudo_weights,
        score_linear_model,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.translate(F.col("text"), _LAT, _CYR),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    w = pseudo_weights(spark, n_features=_Q164_N_FEATURES)
    return (
        score_linear_model(
            docs,
            "doc_id",
            F.col("text"),
            w,
            n_features=_Q164_N_FEATURES,
            hash_family="md5",
            token_classes="unicode",
        )
        .select("doc_id", "logit", "kept")
        .orderBy("doc_id")
    )


_Q167_SQL = """
WITH w AS (
  SELECT range AS feature_id,
         ('0x' || substr(md5(CAST(range AS VARCHAR)), 1, 13))::BIGINT
           % 2001 - 1000 AS weight
  FROM range(262144)),
docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN translate(text, 'abcdefghijklmnopqrstuvwxyz',
                             'абвгдежзийклмнопрстуфхцчшщ')
              ELSE text END AS text
  FROM documents),
canon AS (
  SELECT doc_id,
         translate(trim(regexp_replace(text, '[^\\p{L}\\p{N}]+', ' ', 'g')),
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                   'abcdefghijklmnopqrstuvwxyz') AS c
  FROM docs),
ws AS (
  SELECT doc_id, string_split(c, ' ') AS wlist
  FROM canon WHERE len(c) > 0),
grams AS (
  SELECT doc_id, unnest(wlist) AS g FROM ws
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(wlist)),
                               i -> wlist[i] || ' ' || wlist[i+1])) AS g
  FROM ws WHERE len(wlist) >= 2),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 13))::BIGINT % 262144 AS feature_id,
         count(*) AS tf
  FROM grams GROUP BY 1, 2),
sums AS (
  SELECT f.doc_id, sum(f.tf * w.weight) AS dot
  FROM feats f JOIN w ON w.feature_id = f.feature_id
  GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(s.dot, 0) AS BIGINT) AS logit,
       coalesce(s.dot, 0) >= 0 AS kept
FROM documents d
LEFT JOIN sums s ON s.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# q192 — the q167 learned filter on a SEPARATOR-FREE (Han) corpus: the
# ``token_classes="cjk"`` scorer mode. Every 2nd document is
# re-lettered to 26 Han codepoints AND de-spaced (real Han text has no
# word separators — the q191 synthesis). The point this query pins
# (the r10 verdict's CJK gap, item #4): under "unicode" token classes
# a de-spaced Han document is ONE token per punctuation-free run, so
# the scorer sees ~1 feature per sentence and every Han doc scores
# near the intercept; under "cjk" every Han character is a token and
# the standard unigram+bigram machinery becomes char-1/2-grams —
# real, dense features whose exact int64 logits the oracle reproduces
# bit-for-bit. Same plan shape as q164/q167: one explode over one
# text scan, broadcast model, one corpus shuffle.
# ---------------------------------------------------------------------------

# the 26-codepoint Han alphabet lives in dedup_sim (q191 shares it);
# one definition so the two Han-synthesis queries cannot drift
from gov_data_pipeline_spark.queries.dedup_sim import _HAN as _HAN26  # noqa: E402


def q192_quality_linear_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.scoring import (
        pseudo_weights,
        score_linear_model,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.regexp_replace(
                F.translate(
                    F.col("text"), "abcdefghijklmnopqrstuvwxyz", _HAN26
                ),
                r"\s+",
                "",
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    w = pseudo_weights(spark, n_features=_Q164_N_FEATURES)
    return (
        score_linear_model(
            docs,
            "doc_id",
            F.col("text"),
            w,
            n_features=_Q164_N_FEATURES,
            hash_family="md5",
            token_classes="cjk",
        )
        .select("doc_id", "logit", "kept")
        .orderBy("doc_id")
    )


_Q192_SQL = r"""
WITH w AS (
  SELECT range AS feature_id,
         ('0x' || substr(md5(CAST(range AS VARCHAR)), 1, 13))::BIGINT
           % 2001 - 1000 AS weight
  FROM range(262144)),
docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN regexp_replace(
                     translate(text, 'abcdefghijklmnopqrstuvwxyz',
                               '__HAN26__'),
                     '\s+', '', 'g')
              ELSE text END AS text
  FROM documents),
canon AS (
  SELECT doc_id,
         translate(
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(text, '[^\p{L}\p{N}]+', ' ', 'g'),
               '([\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}])', '\1 ', 'g'),
             ' +', ' ', 'g')),
           'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
           'abcdefghijklmnopqrstuvwxyz') AS c
  FROM docs),
ws AS (
  SELECT doc_id, string_split(c, ' ') AS wlist
  FROM canon WHERE len(c) > 0),
grams AS (
  SELECT doc_id, unnest(wlist) AS g FROM ws
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(wlist)),
                               i -> wlist[i] || ' ' || wlist[i+1])) AS g
  FROM ws WHERE len(wlist) >= 2),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 13))::BIGINT % 262144 AS feature_id,
         count(*) AS tf
  FROM grams GROUP BY 1, 2),
sums AS (
  SELECT f.doc_id, sum(f.tf * w.weight) AS dot
  FROM feats f JOIN w ON w.feature_id = f.feature_id
  GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(s.dot, 0) AS BIGINT) AS logit,
       coalesce(s.dot, 0) >= 0 AS kept
FROM documents d
LEFT JOIN sums s ON s.doc_id = d.doc_id
ORDER BY d.doc_id
""".replace("__HAN26__", _HAN26)


# ---------------------------------------------------------------------------
# q198 — MULTICLASS LINEAR ROUTING (r12, verdict item #5): the
# fastText-langid shape — k one-vs-all linear scorers over ONE shared
# hashed feature space, deterministic argmax (ties to smallest class
# id). Corpus and ground truth are q170's derived mixed-script fixture
# (Cyrillic translate on the even half, CJK+digits suffix on every 7th
# doc; label = dominant script). The model is built BY the engine from
# the same corpus (operators/scoring.class_count_model — per-class
# exact int64 token counts), then every document routes through
# score_multiclass_model: one feature explode, broadcast model join,
# one (id, class) sum, one per-id argmax window — no per-class corpus
# scan (plan-pinned in tests/test_plans.py). The oracle rebuilds
# model, logits, and argmax from scratch in DuckDB; predicted class
# and winning logit hash bit-for-bit. Routing accuracy is reported as
# a per-doc `correct` flag rather than claimed: the Cyrillic half
# shares no letter features with the Latin half, so the count router
# should separate them cleanly, and the oracle proves exactly how
# cleanly.
# ---------------------------------------------------------------------------

_Q198_N_FEATURES = 1 << 18


def q198_multiclass_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.functions.textstats import (
        dominant_script_col,
        script_counts_chained,
    )
    from gov_data_pipeline_spark.operators.scoring import (
        class_count_model,
        hashed_token_features,
        score_multiclass_model,
    )

    _LO = "abcdefghijklmnopqrstuvwxyz"
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 2 == 0,
                F.translate(F.col("text"), _LO, "абвгдежзийклмнопрстуфхцчшщ"),
            ).otherwise(F.col("text")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" 你好 世界 数据 42")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    t = F.col("text")
    # labeled is PINNED (r13): it feeds the model's label join, both
    # halves' feature subtrees, and the scorer's final doc join — four
    # consumers, each of which otherwise recomputes translate+concat
    # and THREE script counts over the full corpus text (the r13 plan
    # audit counted 8 parquet scans / 2 feature explodes; exchange
    # reuse never fired once the model side broadcast).
    # CO-PARTITIONED by doc_id (r14, guide §2.4): the labeled pin is
    # hash(doc_id)-partitioned and pin_partitioned captures that
    # layout, so (a) the feature build's tf groupBy (doc_id, label,
    # feature_id) runs with ZERO exchanges on top of it, (b) the feats
    # pin inherits the same hash(doc_id) layout, and (c) the scorer's
    # (id, class) sum, per-id argmax, and final labeled⋈best join all
    # plan exchange-free — the r13 final DAG re-shuffled the feature
    # relation by doc_id twice and the doc join once.
    # Chained-strip script counts (r14, guide §1.2): the label's three
    # per-class regexp_counts each scanned the full text; the chained
    # form measured 3x faster (0.59 -> 0.26 s interleaved best-of-4 at
    # sf0.1) with bit-identical counts — see script_counts_chained.
    labeled = pin_partitioned(
        docs.select(
            "doc_id",
            "text",
            dominant_script_col(
                *script_counts_chained(t)
            ).alias("label"),
        ),
        "doc_id",
    )
    # ONE corpus explode for build AND route (r13): the hashed feature
    # frame is built once from the pinned labeled frame and handed to
    # both halves — the q168 feats= pattern. The label RIDES the
    # explode (carry=) so the model build aggregates the pinned frame
    # directly — no per-doc labels join, one less full shuffle of the
    # feature relation (measured 1.06 s → 0.48 s for the model build;
    # the scorer projects the label away before its own join).
    feats = pin_partitioned(
        hashed_token_features(
            labeled,
            "doc_id",
            F.col("text"),
            n_features=_Q198_N_FEATURES,
            hash_family="md5",
            token_classes="cjk",
            carry=["label"],
        )
    )
    model = class_count_model(
        labeled,
        "doc_id",
        F.col("text"),
        F.col("label"),
        n_features=_Q198_N_FEATURES,
        hash_family="md5",
        token_classes="cjk",
        feats=feats,
        feats_class_col="label",
    )
    routed = score_multiclass_model(
        labeled,
        "doc_id",
        F.col("text"),
        model,
        n_features=_Q198_N_FEATURES,
        hash_family="md5",
        token_classes="cjk",
        feats=feats,
    )
    return (
        routed.select(
            "doc_id",
            "label",
            "pred_class",
            "logit",
            (F.col("label") == F.col("pred_class")).alias("correct"),
        )
        .orderBy("doc_id")
    )


_Q198_SQL = r"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN translate(text, 'abcdefghijklmnopqrstuvwxyz',
                             'абвгдежзийклмнопрстуфхцчшщ')
              ELSE text END
         || CASE WHEN doc_id % 7 = 0 THEN ' 你好 世界 数据 42'
                 ELSE '' END AS text
  FROM documents),
labeled AS (
  SELECT doc_id, text,
         CASE WHEN n_latin = 0 AND n_cyrillic = 0 AND n_han = 0 THEN 'none'
              WHEN n_latin >= n_cyrillic AND n_latin >= n_han THEN 'latin'
              WHEN n_cyrillic >= n_han THEN 'cyrillic'
              ELSE 'han' END AS label
  FROM (SELECT doc_id, text,
               coalesce(len(regexp_extract_all(text, '[A-Za-z]')), 0)
                 AS n_latin,
               coalesce(len(regexp_extract_all(text, '\p{Cyrillic}')), 0)
                 AS n_cyrillic,
               coalesce(len(regexp_extract_all(text, '\p{Han}')), 0)
                 AS n_han
        FROM base)),
canon AS (
  SELECT doc_id,
         translate(
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(text, '[^\p{L}\p{N}]+', ' ', 'g'),
               '([\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}])', '\1 ', 'g'),
             ' +', ' ', 'g')),
           'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
           'abcdefghijklmnopqrstuvwxyz') AS c
  FROM labeled),
ws AS (
  SELECT doc_id, string_split(c, ' ') AS wlist
  FROM canon WHERE len(c) > 0),
grams AS (
  SELECT doc_id, unnest(wlist) AS g FROM ws
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(wlist)),
                               i -> wlist[i] || ' ' || wlist[i+1])) AS g
  FROM ws WHERE len(wlist) >= 2),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 13))::BIGINT % 262144 AS feature_id,
         count(*) AS tf
  FROM grams GROUP BY 1, 2),
model AS (
  SELECT l.label AS class_id, f.feature_id, sum(f.tf) AS weight
  FROM feats f JOIN labeled l USING (doc_id)
  GROUP BY 1, 2),
sums AS (
  SELECT f.doc_id, m.class_id, sum(f.tf * m.weight) AS logit
  FROM feats f JOIN model m ON m.feature_id = f.feature_id
  GROUP BY 1, 2),
best AS (
  SELECT doc_id, class_id, logit FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY logit DESC, class_id ASC) AS rn
    FROM sums) WHERE rn = 1)
SELECT l.doc_id, l.label,
       b.class_id AS pred_class,
       CAST(b.logit AS BIGINT) AS logit,
       l.label = b.class_id AS correct
FROM labeled l LEFT JOIN best b USING (doc_id)
ORDER BY l.doc_id
"""


_Q166_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column",
       count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_str,
       CAST(max({c}) AS VARCHAR) AS max_str
FROM orders"""
    for c in _Q166_COLS
) + '\nORDER BY "column"'


# ---------------------------------------------------------------------------
# q177 — DSIR-style data selection (importance weighting on hashed
# n-gram LMs; Xie et al. 2023, "Data Selection for Language Models via
# Importance Resampling"). Two bag-of-hashed-grams language models —
# TARGET (here: the English slice, the distribution we want more of)
# and RAW (the whole corpus) — add-one smoothed over B = 2^16 buckets;
# every document scores the mean per-gram log importance ratio
# ln(p_tgt / p_raw), and the top-K by (rounded weight, doc_id) are
# selected. This is the deterministic top-K variant of the paper's
# resampling step (the sampling itself is a weighted draw — q115's
# machinery — but top-K is what makes the output oracle-exact).
#
# Shape at scale: gram rows reduce to TWO bucket-count relations of at
# most B = 65 536 rows each (map-side-partial aggregates); the model
# join is bucket-keyed against a relation AQE will broadcast; totals
# are 1-row broadcasts; the per-doc reduce is one doc_id hash
# aggregate; selection is TakeOrderedAndProject (the q14 top-k shape,
# never a global sort). Nothing document-sized crosses an exchange
# after the first aggregate. ln() on identical integer inputs + round(4)
# is the q94 cross-engine convention.
# ---------------------------------------------------------------------------

_Q177_BUCKETS = 1 << 16
_Q177_K = 200


def q177_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.scoring import hashed_token_features

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    feats = hashed_token_features(
        docs,
        "doc_id",
        F.col("text"),
        n_features=_Q177_BUCKETS,
        bigrams=True,
        hash_family="md5",
    )
    raw = feats.groupBy("feature_id").agg(F.sum("tf").alias("c_raw"))
    tgt = (
        feats.join(
            docs.filter(F.col("lang") == "en").select("doc_id"), "doc_id"
        )
        .groupBy("feature_id")
        .agg(F.sum("tf").alias("c_tgt"))
    )
    model = raw.join(tgt, "feature_id", "left").select(
        "feature_id", "c_raw", F.coalesce("c_tgt", F.lit(0)).alias("c_tgt")
    )
    totals = model.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    b = F.lit(float(_Q177_BUCKETS))
    ratio = (
        F.log(F.col("c_tgt") + 1)
        - F.log(F.col("n_tgt") + b)
        - F.log(F.col("c_raw") + 1)
        + F.log(F.col("n_raw") + b)
    )
    scored = (
        feats.join(model, "feature_id")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_grams"),
            F.round(F.sum(F.col("tf") * ratio) / F.sum("tf"), 4).alias(
                "weight"
            ),
        )
    )
    return (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "n_grams", "weight")
        .orderBy(F.col("weight").desc(), F.col("doc_id").asc())
        .limit(_Q177_K)
    )


_Q177_SQL = f"""
WITH canon AS (
  SELECT doc_id,
         lower(trim(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g'))) AS c
  FROM documents),
ws AS (
  SELECT doc_id, string_split(c, ' ') AS wlist
  FROM canon WHERE len(c) > 0),
grams AS (
  SELECT doc_id, unnest(wlist) AS g FROM ws
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(wlist)),
                               i -> wlist[i] || ' ' || wlist[i+1])) AS g
  FROM ws WHERE len(wlist) >= 2),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 13))::BIGINT % {_Q177_BUCKETS}
           AS feature_id,
         count(*) AS tf
  FROM grams GROUP BY 1, 2),
raw AS (SELECT feature_id, sum(tf) AS c_raw FROM feats GROUP BY 1),
tgt AS (
  SELECT f.feature_id, sum(f.tf) AS c_tgt
  FROM feats f JOIN documents d ON d.doc_id = f.doc_id AND d.lang = 'en'
  GROUP BY 1),
model AS (
  SELECT r.feature_id, r.c_raw, coalesce(t.c_tgt, 0) AS c_tgt
  FROM raw r LEFT JOIN tgt t ON t.feature_id = r.feature_id),
tot AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt FROM model)
SELECT f.doc_id, d.lang, CAST(sum(f.tf) AS BIGINT) AS n_grams,
       round(sum(f.tf * (ln(m.c_tgt + 1) - ln(n_tgt + {_Q177_BUCKETS}.0)
                         - ln(m.c_raw + 1) + ln(n_raw + {_Q177_BUCKETS}.0)))
             / sum(f.tf), 4) AS weight
FROM feats f
JOIN model m ON m.feature_id = f.feature_id
CROSS JOIN tot
JOIN documents d ON d.doc_id = f.doc_id
GROUP BY f.doc_id, d.lang
ORDER BY weight DESC, f.doc_id ASC
LIMIT {_Q177_K}
"""


# ---------------------------------------------------------------------------
# q178 — per-source boilerplate-line removal (the CCNet/trafilatura
# hygiene pass: a line that recurs across many documents of one source
# — nav bars, footers, subscribe prompts — is template, not content).
# The fixture's documents are single-line, so the query first derives
# a deterministic multi-line corpus in-query (the q90
# synthesize-then-process pattern): a per-source digest line on every
# document (always boilerplate), the original text, a per-source
# newsletter line on every 3rd document (crosses the df threshold only
# when the source has enough documents — sf-dependent on purpose), and
# a per-document footer (never removed). A line is boilerplate when it
# appears in MORE THAN _Q178_DF_MAX distinct documents of the same
# source; surviving lines reassemble in original order.
#
# Shape at scale: one posexplode over one scan; the df aggregate
# reduces line rows to the (source, line) vocabulary (boilerplate
# vocabulary ≪ corpus, map-side partial); the verdict joins back on
# the same (source, line) key; reassembly is ONE doc_id shuffle with
# collect_list + array_sort (positions are unique per doc, so the sort
# is total). At 100 TB the only change is hashing the line key (md5)
# before the aggregate — the join stays key-local either way.
# ---------------------------------------------------------------------------

_Q178_DF_MAX = 9


def q178_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    assembled = docs.select(
        "doc_id",
        "source",
        F.concat_ws(
            "\n",
            F.concat(F.lit("follow "), F.col("source"), F.lit(" daily digest")),
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("subscribe to "), F.col("source"), F.lit(" newsletter")
                ),
            ),
            F.concat(
                F.lit("doc "),
                F.col("doc_id").cast("string"),
                F.lit(" archive footer"),
            ),
        ).alias("t"),
    )
    lines = assembled.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.col("t"), "\n")).alias("pos", "line"),
    )
    dfc = lines.groupBy("source", "line").agg(
        F.count_distinct("doc_id").alias("df")
    )
    keep = F.col("df") <= _Q178_DF_MAX
    return (
        lines.join(dfc, ["source", "line"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(keep, 0).otherwise(1)).alias("n_removed"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct(F.col("pos"), F.col("line")))
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("cleaned"),
        )
        .orderBy("doc_id")
    )


_Q178_SQL = f"""
WITH assembled AS (
  SELECT doc_id, source,
         concat_ws(chr(10),
           'follow ' || source || ' daily digest',
           text,
           CASE WHEN doc_id % 3 = 0
                THEN 'subscribe to ' || source || ' newsletter' END,
           'doc ' || doc_id::VARCHAR || ' archive footer') AS t
  FROM documents),
lines AS (
  SELECT doc_id, source,
         unnest(range(1, len(l) + 1)) AS pos, unnest(l) AS line
  FROM (SELECT doc_id, source, string_split(t, chr(10)) AS l
        FROM assembled)),
dfc AS (
  SELECT source, line, count(DISTINCT doc_id) AS df
  FROM lines GROUP BY 1, 2)
SELECT l.doc_id,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN df <= {_Q178_DF_MAX} THEN 0 ELSE 1 END) AS BIGINT)
         AS n_removed,
       coalesce(string_agg(CASE WHEN df <= {_Q178_DF_MAX} THEN l.line END,
                           chr(10) ORDER BY l.pos), '') AS cleaned
FROM lines l JOIN dfc USING (source, line)
GROUP BY l.doc_id
ORDER BY l.doc_id
"""


# ---------------------------------------------------------------------------
# q179 — classifier threshold sweep (precision / recall / F1 curve)
# over the q164 learned quality scorer — the evaluation loop that
# turns "the filter scores documents" into "ship threshold T": logits
# band into fixed-width buckets, the per-band (positives, negatives)
# HISTOGRAM is the only thing the cumulative window ever sees, and
# each band row reports the metrics of the rule "keep iff logit >=
# band floor". Labels are deterministic from the fixture (mentions
# 'spark' — the q168 labeling), logits are exact int64, so every
# count is exact and each metric is one int/int division rounded to 4.
#
# Shape at scale: scoring is the pinned q164 plan (one explode, one
# broadcast model join, one doc_id shuffle); the corpus then reduces
# to a ≤ few-dozen-row band histogram in ONE map-side-partial
# aggregate, and the cumulative window runs over THAT histogram —
# never over per-document rows (the window is single-partition by
# construction, which is safe only because its input is band-sized;
# the band width is the knob that caps it).
# ---------------------------------------------------------------------------

_Q179_BAND = 4096


def q179_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from gov_data_pipeline_spark.operators.scoring import (
        pseudo_weights,
        score_linear_model,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # score_linear_model carries the input columns through, so the
    # label reads `text` straight off the scored frame — re-joining
    # documents here would add a second scan purely to recover a
    # column the frame already has (review-caught).
    scored = score_linear_model(
        docs,
        "doc_id",
        F.col("text"),
        pseudo_weights(spark, n_features=_Q164_N_FEATURES),
        n_features=_Q164_N_FEATURES,
        hash_family="md5",
    )
    labeled = scored.select(
        F.floor(F.col("logit") / _Q179_BAND).cast("long").alias("band"),
        F.coalesce(
            F.col("text").contains("spark").cast("int"), F.lit(0)
        ).alias("y"),
    )
    hist = labeled.groupBy("band").agg(
        F.sum("y").alias("n_pos"),
        F.sum(1 - F.col("y")).alias("n_neg"),
    )
    win = W.orderBy(F.col("band").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    totals = hist.agg(F.sum("n_pos").alias("total_pos"))
    cum = (
        hist.withColumn("tp", F.sum("n_pos").over(win))
        .withColumn("fp", F.sum("n_neg").over(win))
        .crossJoin(F.broadcast(totals))
    )
    return cum.select(
        (F.col("band") * _Q179_BAND).alias("threshold"),
        (F.col("tp") + F.col("fp")).alias("n_pred_pos"),
        "tp",
        F.round(F.try_divide(F.col("tp"), F.col("tp") + F.col("fp")), 4).alias(
            "precision"
        ),
        F.round(F.try_divide(F.col("tp"), F.col("total_pos")), 4).alias(
            "recall"
        ),
        F.round(
            F.try_divide(
                2 * F.col("tp"),
                F.col("tp") + F.col("fp") + F.col("total_pos"),
            ),
            4,
        ).alias("f1"),
    ).orderBy(F.col("threshold").desc())


_Q179_SQL = f"""
WITH w AS (
  SELECT range AS feature_id,
         ('0x' || substr(md5(CAST(range AS VARCHAR)), 1, 13))::BIGINT
           % 2001 - 1000 AS weight
  FROM range(262144)),
canon AS (
  SELECT doc_id,
         lower(trim(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g'))) AS c
  FROM documents),
ws AS (
  SELECT doc_id, string_split(c, ' ') AS wlist
  FROM canon WHERE len(c) > 0),
grams AS (
  SELECT doc_id, unnest(wlist) AS g FROM ws
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(wlist)),
                               i -> wlist[i] || ' ' || wlist[i+1])) AS g
  FROM ws WHERE len(wlist) >= 2),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 13))::BIGINT % 262144 AS feature_id,
         count(*) AS tf
  FROM grams GROUP BY 1, 2),
sums AS (
  SELECT f.doc_id, sum(f.tf * w.weight) AS dot
  FROM feats f JOIN w ON w.feature_id = f.feature_id
  GROUP BY 1),
labeled AS (
  SELECT CAST(floor(coalesce(s.dot, 0) / {_Q179_BAND}.0) AS BIGINT) AS band,
         CASE WHEN d.text LIKE '%spark%' THEN 1 ELSE 0 END AS y
  FROM documents d LEFT JOIN sums s ON s.doc_id = d.doc_id),
hist AS (
  SELECT band, CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(1 - y) AS BIGINT) AS n_neg
  FROM labeled GROUP BY band),
cum AS (
  SELECT band,
         sum(n_pos) OVER (ORDER BY band DESC
                          ROWS UNBOUNDED PRECEDING) AS tp,
         sum(n_neg) OVER (ORDER BY band DESC
                          ROWS UNBOUNDED PRECEDING) AS fp,
         (SELECT sum(n_pos) FROM hist) AS total_pos
  FROM hist)
SELECT band * {_Q179_BAND} AS threshold,
       CAST(tp + fp AS BIGINT) AS n_pred_pos,
       CAST(tp AS BIGINT) AS tp,
       round(tp / nullif(tp + fp, 0), 4) AS precision,
       round(tp / nullif(total_pos, 0), 4) AS recall,
       round(2 * tp / nullif(tp + fp + total_pos, 0), 4) AS f1
FROM cum
ORDER BY threshold DESC
"""


# ---------------------------------------------------------------------------
# q180 — CCNet-style language-model buckets: score every document with
# the corpus's own unigram LM (exactly q94's perplexity proxy), then
# split EACH LANGUAGE into head / middle / tail terciles on that score
# — the final shape CCNet publishes its corpus in (Wenzek et al. 2020:
# per-language perplexity buckets from a KenLM; here the LM is the
# q94 unigram model and the terciles are exact type-7 percentiles, the
# q111 parity pair). Documents with no tokens carry no score and are
# excluded (both engines inner-join scores).
#
# Shape at scale: the q94 scoring plan (vocabulary aggregate ≪ corpus,
# token-key join, doc_id reduce), then cutoffs are ONE per-lang
# aggregate (5 rows) broadcast back onto the scored frame — no
# per-language window over document rows, so no corpus-sized sort.
# Bucketing compares ROUNDED score to ROUNDED cutoff: both engines
# interpolate over identical rounded inputs, so the comparison can
# never straddle an ulp.
# ---------------------------------------------------------------------------


def q180_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.functions.textstats import term_rows

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = term_rows(docs, "doc_id", F.col("text"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.log(F.col("cnt") / F.col("total")))
                / F.count(F.lit(1)),
                4,
            ).alias("score")
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    cuts = scored.groupBy("lang").agg(
        F.round(F.expr("percentile(score, 1.0D / 3)"), 4).alias("c33"),
        F.round(F.expr("percentile(score, 2.0D / 3)"), 4).alias("c66"),
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id",
            "lang",
            "score",
            F.when(F.col("score") >= F.col("c66"), "head")
            .when(F.col("score") >= F.col("c33"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


_Q180_SQL = r"""
WITH toks AS (
  SELECT * FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
    FROM documents) WHERE term <> ''),
v AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
t AS (SELECT sum(cnt) AS total FROM v),
scored AS (
  SELECT doc_id, round(sum(ln(cnt / total)) / count(*), 4) AS score
  FROM toks JOIN v USING (term) CROSS JOIN t
  GROUP BY doc_id),
sl AS (
  SELECT s.doc_id, d.lang, s.score
  FROM scored s JOIN documents d USING (doc_id)),
cuts AS (
  SELECT lang,
         round(quantile_cont(score, 1.0 / 3), 4) AS c33,
         round(quantile_cont(score, 2.0 / 3), 4) AS c66
  FROM sl GROUP BY lang)
SELECT doc_id, lang, score,
       CASE WHEN score >= c66 THEN 'head'
            WHEN score >= c33 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM sl JOIN cuts USING (lang)
ORDER BY doc_id
"""


QUERIES = {
    "q128_expectations": q128_expectations,
    "q164_quality_linear": q164_quality_linear,
    "q167_quality_linear_unicode": q167_quality_linear_unicode,
    "q192_quality_linear_cjk": q192_quality_linear_cjk,
    "q198_multiclass_route": q198_multiclass_route,
    "q168_quality_trained": q168_quality_trained,
    "q173_multilingual_curation": q173_multilingual_curation,
    "q177_dsir_select": q177_dsir_select,
    "q178_boilerplate_lines": q178_boilerplate_lines,
    "q179_pr_curve": q179_pr_curve,
    "q180_lm_buckets": q180_lm_buckets,
    "q166_column_profile": q166_column_profile,
    "q122_k_anonymity": q122_k_anonymity,
    "q90_pii_redact": q90_pii_redact,
    "q93_outlier_zscore": q93_outlier_zscore,
}

ORACLE = {
    "q128_expectations": _Q128_SQL,
    "q164_quality_linear": _Q164_SQL,
    "q167_quality_linear_unicode": _Q167_SQL,
    "q192_quality_linear_cjk": _Q192_SQL,
    "q198_multiclass_route": _Q198_SQL,
    "q168_quality_trained": _Q168_SQL,
    "q173_multilingual_curation": _Q173_SQL,
    "q177_dsir_select": _Q177_SQL,
    "q178_boilerplate_lines": _Q178_SQL,
    "q179_pr_curve": _Q179_SQL,
    "q180_lm_buckets": _Q180_SQL,
    "q166_column_profile": _Q166_SQL,
    "q122_k_anonymity": _Q122_SQL,
    "q90_pii_redact": _Q90_SQL,
    "q93_outlier_zscore": _Q93_SQL,
}
