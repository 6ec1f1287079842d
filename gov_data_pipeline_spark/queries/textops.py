"""Reference-semantics transform queries (SURVEY R13-R17, R20-R21,
T27-T29) with DuckDB oracles.

The fixtures carry no Cyrillic registry data, so these queries
synthesize deterministic messy inputs *inside the query* from fixture
columns (both engines build the identical string, then clean it). The
DuckDB side re-expresses the Python-regex semantics in RE2 — lookarounds
are rewritten with capture groups, valid because the synthesized inputs
have no overlapping matches; the unit tests in
``tests/test_transforms.py`` cover the general edge cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gov_data_pipeline_spark.catalog import read_table as _t
from gov_data_pipeline_spark.transforms import (
    clean_cell_col,
    clean_text_col,
    merge_continuation_rows,
    normalize_reg_num_col,
)
from gov_data_pipeline_spark.transforms.text import (
    PII_PATTERNS,
    exclusion_flag_col,
)


# ---------------------------------------------------------------------------
# R13/T29 — Kazakhstan clean_text (incl. NFKC pandas_udf) over documents.
# Input is roughened with injected whitespace so the cleaning does work.
# ---------------------------------------------------------------------------


def q20_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    messy = F.concat(F.lit("  "), F.col("text"), F.lit("\n\n "), F.col("source"), F.lit("\t"))
    return (
        docs.select(
            "doc_id",
            clean_text_col(messy).alias("cleaned"),
        )
        .withColumn("clean_len", F.length("cleaned"))
        .orderBy("doc_id")
    )


# Oracle boundary (pinned in tests/test_registry.py's unicode-parity
# sweep): this SQL mirrors the trim/newline/whitespace/charclass chain
# but NOT the NFKC fold — DuckDB has no NFKC function (nfc_normalize is
# canonical-only), so the oracle is exact iff the fixture text is
# NFKC-invariant (true of the driver fixtures). Compatibility folds
# (fullwidth forms, ligatures, U+3000) are pinned against Python's
# unicodedata in tests/test_transforms.py::test_nfkc_compatibility_forms.
_Q20_SQL = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace('  ' || text || CHR(10) || CHR(10) || ' ' || source || CHR(9),
                              '^\s+|\s+$', '', 'g'),
               CHR(10), ' ', 'g'),
             CHR(13), '', 'g'),
           '\s{2,}', ' ', 'g'),
         '[^\w\s\.,;:№\-]', '', 'g') AS cleaned,
       length(regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace('  ' || text || CHR(10) || CHR(10) || ' ' || source || CHR(9),
                              '^\s+|\s+$', '', 'g'),
               CHR(10), ' ', 'g'),
             CHR(13), '', 'g'),
           '\s{2,}', ' ', 'g'),
         '[^\w\s\.,;:№\-]', '', 'g')) AS clean_len
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# R15 — registration-number normalizer (full 10-rule chain, JVM regex).
# ---------------------------------------------------------------------------


def q21_reg_num(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    messy = F.concat(
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("См.")).otherwise(F.lit("№ ")),
        F.col("o_orderkey").cast("string"),
        F.lit("  "),
        F.col("o_custkey").cast("string"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(" – ТЗ")).otherwise(F.lit(" /ТЗ")),
    )
    return (
        orders.select(
            "o_orderkey",
            messy.alias("raw"),
            normalize_reg_num_col(messy).alias("reg_num"),
        )
        .orderBy("o_orderkey")
    )


# RE2 rewrites of the two lookaround rules: digit-gap close uses capture
# groups (single gap per input by construction), "См." re-spacing uses a
# captured non-space.
_Q21_SQL = r"""
WITH raw AS (
  SELECT o_orderkey,
         (CASE WHEN o_orderkey % 5 = 0 THEN 'См.' ELSE '№ ' END)
         || CAST(o_orderkey AS VARCHAR) || '  ' || CAST(o_custkey AS VARCHAR)
         || (CASE WHEN o_orderkey % 3 = 0 THEN ' – ТЗ' ELSE ' /ТЗ' END) AS raw
  FROM orders),
s0  AS (SELECT o_orderkey, raw, regexp_replace(raw, '^\s+|\s+$', '', 'g') AS v FROM raw),
s1  AS (SELECT o_orderkey, raw, regexp_replace(v, '^№\s*', '') AS v FROM s0),
s2  AS (SELECT o_orderkey, raw, regexp_replace(v, '\s*См\.\s*', ' См. ', 'g') AS v FROM s1),
s3  AS (SELECT o_orderkey, raw, regexp_replace(v, '\s*[–—]\s*', '-', 'g') AS v FROM s2),
s4  AS (SELECT o_orderkey, raw, regexp_replace(v, '\s*-\s*', '-', 'g') AS v FROM s3),
s5  AS (SELECT o_orderkey, raw, regexp_replace(v, '\s*/\s*', '/', 'g') AS v FROM s4),
s6  AS (SELECT o_orderkey, raw, regexp_replace(v, '\s*\.\s*', '.', 'g') AS v FROM s5),
s7  AS (SELECT o_orderkey, raw, regexp_replace(v, '(\d)\s+(\d)', '\1\2', 'g') AS v FROM s6),
s8  AS (SELECT o_orderkey, raw, regexp_replace(v, '(См\.)(\S)', '\1 \2', 'g') AS v FROM s7),
s9  AS (SELECT o_orderkey, raw, regexp_replace(v, '-{2,}', '-', 'g') AS v FROM s8),
s10 AS (SELECT o_orderkey, raw, regexp_replace(v, '\s+', ' ', 'g') AS v FROM s9)
SELECT o_orderkey, raw, regexp_replace(v, '^\s+|\s+$', '', 'g') AS reg_num
FROM s10
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# R20/R21 — exclusion predicate + Да/Нет flag column.
# ---------------------------------------------------------------------------


def q22_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    marker = (
        F.when(F.col("doc_id") % 7 == 0, F.lit(" товар ИсключЁн из реестра"))
        .when(F.col("doc_id") % 7 == 1, F.lit(" за исключением случаев"))
        .otherwise(F.lit(""))
    )
    text2 = F.concat(F.col("text"), marker)
    return docs.select(
        "doc_id", exclusion_flag_col(text2).alias("excluded")
    ).orderBy("doc_id")


_Q22_SQL = r"""
SELECT doc_id,
       CASE WHEN regexp_matches(
              replace(lower(text || CASE WHEN doc_id % 7 = 0 THEN ' товар ИсключЁн из реестра'
                                         WHEN doc_id % 7 = 1 THEN ' за исключением случаев'
                                         ELSE '' END), 'ё', 'е'),
              '(^|[^а-я])и\s*с\s*к\s*л\s*ю\s*ч\s*е\s*н($|[^а-я])')
            THEN 'Да' ELSE 'Нет' END AS excluded
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# R14 — clean_cell over roughened strings.
# ---------------------------------------------------------------------------


def q23_clean_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("\t "), F.substring("text", 1, 40), F.lit("  \n"), F.col("lang"), F.lit(" ")
    )
    return docs.select("doc_id", clean_cell_col(messy).alias("cell")).orderBy("doc_id")


_Q23_SQL = r"""
SELECT doc_id,
       regexp_replace(regexp_replace(CHR(9) || ' ' || substr(text, 1, 40) || '  ' || CHR(10) || lang || ' ',
                                     '\s+', ' ', 'g'),
                      '^ | $', '', 'g') AS cell
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# R17/T18 — continuation-row merge on a synthesized registry shape:
# every 4th row starts a record; 'Name:' noise rows are dropped; other
# rows merge into the previous record with ordered, empty-skipping
# space-concat. Full DuckDB oracle via the same window-gid construction.
# ---------------------------------------------------------------------------


def q24_merge_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    reg = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("№"), (F.col("doc_id") + 1000).cast("string"), F.lit("/ТЗ")))
        .when(F.col("doc_id") % 8 == 2, F.lit("Name: шум"))
        .when(F.col("doc_id") % 4 == 3, F.lit(""))
        .otherwise(F.lit("продолжение записи"))
    )
    base = docs.select(
        F.col("doc_id").alias("idx"),
        reg.alias("reg"),
        F.substring("text", 1, 12).alias("payload"),
    )
    return merge_continuation_rows(base, key_col="reg", idx_col="idx").orderBy("idx")


_Q24_SQL = r"""
WITH base AS (
  SELECT doc_id AS idx,
         CASE WHEN doc_id % 4 = 0 THEN '№' || CAST(doc_id + 1000 AS VARCHAR) || '/ТЗ'
              WHEN doc_id % 8 = 2 THEN 'Name: шум'
              WHEN doc_id % 4 = 3 THEN ''
              ELSE 'продолжение записи' END AS reg,
         substr(text, 1, 12) AS payload
  FROM documents),
kept AS (
  SELECT * FROM base WHERE NOT starts_with(trim(reg), 'Name:')),
flagged AS (
  SELECT *,
         sum(CASE WHEN regexp_matches(trim(reg), '^(№?\d{4,})(/ТЗ.*)?') THEN 1 ELSE 0 END)
           OVER (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
  FROM kept)
SELECT min(idx) AS idx,
       coalesce(string_agg(nullif(trim(reg), ''), ' ' ORDER BY idx), '') AS reg,
       coalesce(string_agg(nullif(trim(payload), ''), ' ' ORDER BY idx), '') AS payload
FROM flagged
GROUP BY gid
ORDER BY idx
"""


# ---------------------------------------------------------------------------
# q194 — PII SCRUB (r11): mask emails / IPv4s / phone-shaped spans
# with typed placeholder tokens and report per-document counts — the
# first step of every published pretraining-curation pipeline (the
# Dolma/RedPajama core family), as a pure codegen'd regexp_replace
# chain (no UDF, no exchange until the output sort). The fixture is
# PII-free, so the corpus plants spans in-query (the q167 synthesize
# pattern): every 3rd doc an email, every 5th an IPv4, every 7th an
# international phone — deterministic concat in both engines, and the
# families OVERLAP on doc_id multiples so chained-order effects are
# exercised. Patterns are lookaround-free explicit ASCII classes
# (identical in Java regex and RE2); replace order is email → IP →
# phone so a digit-bearing email local part is masked before the
# phone pattern can nibble it. Over-masking (a date masked as
# <PHONE>) is deliberate scrubber posture and identical in both
# engines — the oracle checks the masked TEXT byte-for-byte, not just
# the counts.
# ---------------------------------------------------------------------------


def q194_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.transforms import pii_count_col, scrub_pii_col

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact bob.smith+pr"),
                F.col("doc_id").cast("string"),
                F.lit("@example-mail.co.uk now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" from host 10.20."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 today"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit(" call +44 (020) 7946-0958 x"),
        ).otherwise(F.lit("")),
    )
    base = docs.select("doc_id", planted.alias("__t"))
    return (
        base.select(
            "doc_id",
            pii_count_col(F.col("__t"), "email").alias("n_email"),
            pii_count_col(F.col("__t"), "ip").alias("n_ip"),
            pii_count_col(F.col("__t"), "phone").alias("n_phone"),
            scrub_pii_col(F.col("__t")).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


# Oracle regexes DERIVED from the one source of truth
# (transforms.text.PII_PATTERNS — RE2-compatible by that module's
# cross-engine contract) instead of re-declared literals: an edit to
# the scrub patterns now reaches the oracle in the same commit rather
# than drifting silently until a driver run catches it (the q192/_HAN
# convention; review-caught r11).
_PII_RE = {k: p for k, p, _ in PII_PATTERNS}
_PII_EMAIL = _PII_RE["email"]
_PII_IP = _PII_RE["ip"]
_PII_PHONE = _PII_RE["phone"]

_Q194_SQL = rf"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact bob.smith+pr' || CAST(doc_id AS VARCHAR)
                      || '@example-mail.co.uk now' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from host 10.20.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.7 today' ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call +44 (020) 7946-0958 x' ELSE '' END AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS n_ip,
       CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
       regexp_replace(
         regexp_replace(
           regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IP}', '<IP>', 'g'),
         '{_PII_PHONE}', '<PHONE>', 'g') AS clean_text
FROM planted
ORDER BY doc_id
"""


QUERIES = {
    "q20_clean_text": q20_clean_text,
    "q21_reg_num": q21_reg_num,
    "q22_exclusion": q22_exclusion,
    "q23_clean_cell": q23_clean_cell,
    "q24_merge_continuation": q24_merge_continuation,
    "q194_pii_scrub": q194_pii_scrub,
}

ORACLE = {
    "q20_clean_text": _Q20_SQL,
    "q21_reg_num": _Q21_SQL,
    "q22_exclusion": _Q22_SQL,
    "q23_clean_cell": _Q23_SQL,
    "q24_merge_continuation": _Q24_SQL,
    "q194_pii_scrub": _Q194_SQL,
}
