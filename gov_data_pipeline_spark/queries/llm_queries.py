"""LLM-enrichment queries (SURVEY L1-L4) under the deterministic mock
model — mock outputs are pure SQL-expressible functions of the inputs,
so the full enrichment composition (exclusion gating, OCR gate +
RECOG suffix, prompt cleaning, variant splicing, row correction) is
hash-checked against a DuckDB oracle end-to-end.

The synthesized registry table (from ``documents``):
- every 3rd doc has a text brand;
- every 3rd+1 doc has an empty brand and a data-URI "image" whose
  base64 payload is a slice of the doc text (mock OCR = decode);
- every 7th doc carries the word "исключен" -> excluded, no enrichment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gov_data_pipeline_spark.catalog import read_table as _t
from gov_data_pipeline_spark.llm import MockLLMClient, enrich_table

_PREFIX = "data:image/png;base64,"


def _registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    brand = F.when(F.col("doc_id") % 3 == 0, F.substring("text", 1, 20)).otherwise(
        F.lit("")
    )
    image = F.when(
        F.col("doc_id") % 3 == 1,
        F.concat(
            F.lit(_PREFIX), F.base64(F.encode(F.substring("text", 21, 24), "UTF-8"))
        ),
    ).otherwise(F.lit(""))
    note = F.when(
        F.col("doc_id") % 7 == 0, F.lit("запись исключена из реестра")
    ).otherwise(F.lit("обычная запись"))
    return docs.select(
        "doc_id",
        brand.alias("brand"),
        image.alias("image"),
        F.col("lang").alias("descr"),
        note.alias("note"),
    )


_REGISTRY_SQL = f"""
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 20) ELSE '' END AS brand,
         CASE WHEN doc_id % 3 = 1
              THEN '{_PREFIX}' || base64(encode(substr(text, 21, 24)))
              ELSE '' END AS image,
         lang AS descr,
         CASE WHEN doc_id % 7 = 0 THEN 'запись исключена из реестра'
              ELSE 'обычная запись' END AS note
  FROM documents
"""

# Exclusion predicate on the concatenated row (RE2 form, no lookbehind —
# equivalent on this data; see textops q22 note).
_EXCL_SQL = (
    "regexp_matches(replace(lower(concat_ws(' ', CAST(doc_id AS VARCHAR), brand, image, "
    "descr, note)), 'ё', 'е'), "
    r"'(^|[^а-я])и\s*с\s*к\s*л\s*ю\s*ч\s*е\s*н($|[^а-я])')"
)


def q50_llm_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = _registry(spark, sf_dir)
    out = enrich_table(
        reg,
        brand_col="brand",
        image_col="image",
        desc_col="descr",
        client_factory=MockLLMClient,
    )
    return out.select(
        "doc_id", "brand", "variants_en", "variants_ru", "excluded"
    ).orderBy("doc_id")


_Q50_SQL = rf"""
WITH reg AS ({_REGISTRY_SQL}),
flagged AS (
  SELECT *, {_EXCL_SQL} AS excl FROM reg),
ocr AS (
  SELECT *,
         CASE WHEN NOT excl AND trim(brand) = '' AND image <> ''
                   AND decode(from_base64(replace(image, '{_PREFIX}', ''))) <> ''
              THEN decode(from_base64(replace(image, '{_PREFIX}', ''))) || ' (RECOG)'
              ELSE brand END AS brand2
  FROM flagged),
prompts AS (
  SELECT *,
         trim(regexp_replace(replace(brand2, ' (RECOG)', ''), '^\s+|\s+$', '', 'g'))
           AS plain
  FROM ocr),
cleaned AS (
  SELECT *,
         array_to_string(
           list_filter(
             string_split(
               trim(regexp_replace(regexp_replace(
                 CASE WHEN trim(descr) <> '' AND plain <> ''
                      THEN plain || '. Description: ' || descr
                      ELSE plain END,
                 '\d+', '', 'g'), '\s+', ' ', 'g')), ' '),
             t -> NOT regexp_matches(t, '^[!"#$%&''()*+,\-./:;<=>?@\[\]\^_`{{|}}~]+$')),
           ' ') AS prompt
  FROM prompts)
SELECT doc_id,
       brand2 AS brand,
       CASE WHEN NOT excl AND plain <> '' THEN upper(prompt) ELSE '' END AS variants_en,
       CASE WHEN NOT excl AND plain <> '' THEN lower(prompt) ELSE '' END AS variants_ru,
       CASE WHEN excl THEN 'Да' ELSE 'Нет' END AS excluded
FROM cleaned
ORDER BY doc_id
"""


def q51_llm_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    reg = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("  "), F.substring("text", 1, 30), F.lit("   x ")).alias(
            "messy"
        ),
        F.col("lang").alias("lang"),
    )
    from gov_data_pipeline_spark.llm import correct_rows

    out = correct_rows(reg, MockLLMClient)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "messy", "lang"
    ).orderBy("doc_id")


_Q51_SQL = r"""
SELECT doc_id,
       trim(regexp_replace('  ' || substr(text, 1, 30) || '   x ', '\s+', ' ', 'g')) AS messy,
       lang
FROM documents
ORDER BY doc_id
"""


def q52_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: pack document text bytes as a
    media struct, extract features in mapInPandas (deterministic stub
    decode), unpack natively. The oracle mirrors the stub arithmetic
    (octet_length / sha256 / md5-char features), so the whole binary
    round-trip is hash-checked."""
    from gov_data_pipeline_spark.sources.multimodal import (
        decode_media_features,
        pack_media_col,
    )

    docs = _t(spark, sf_dir, "documents")
    packed = docs.select(
        "doc_id",
        pack_media_col(F.encode(F.col("text"), "UTF-8"), "image/png").alias("media"),
    )
    feat = decode_media_features(packed, "media")
    return feat.select(
        "doc_id",
        F.col("media_features.n_bytes").alias("n_bytes"),
        F.col("media_features.sha256").alias("digest"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("media_features.features"),
                    F.lit(0.0),
                    lambda a, x: a + x * x,
                )
            ),
            4,
        ).alias("feat_norm"),
    ).orderBy("doc_id")


_Q52_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS digest,
       round(sqrt(list_sum(list_transform(
         string_split_regex(substr(md5(text), 1, 8), ''),
         c -> CAST(ascii(c) AS DOUBLE) * ascii(c)))), 4) AS feat_norm
FROM documents
ORDER BY doc_id
"""


def q84_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling end-to-end over the raw-frame profile: pack
    document text bytes as video/x-raw media (16-byte frames), sample
    every 3rd frame inside mapInPandas (row explosion in the task, not
    the driver), emit each frame payload hex-encoded. The oracle
    hex-encodes the UTF-8 bytes too and slices the hex string (2 chars
    per byte), so the comparison is BYTE-exact on any codepoint —
    DuckDB has no BLOB substring/md5, but char-slicing hex IS byte
    slicing. (Until round 8 the oracle used char-based substr and the
    query was only correct on ASCII fixtures; the adversarial-Unicode
    sweep now asserts equality, not divergence.)"""
    from gov_data_pipeline_spark.sources.multimodal import frame_sample, pack_media_col

    docs = _t(spark, sf_dir, "documents")
    packed = docs.select(
        "doc_id",
        pack_media_col(
            F.encode(F.col("text"), "UTF-8"),
            "video/x-raw",
            F.create_map(F.lit("frame_size"), F.lit("16")).cast(
                "map<string,string>"
            ),
        ).alias("media"),
    )
    frames = frame_sample(packed, "media", every_n=3)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.hex(F.col("frame.data")).alias("frame_hex"),
    ).orderBy("doc_id", "frame_idx")


_Q84_SQL = """
WITH f AS (
  SELECT doc_id, hex(encode(text)) AS h,
         unnest(range(0, octet_length(encode(text)) // 16)) AS frame_idx
  FROM documents)
SELECT doc_id, frame_idx,
       substr(h, CAST(frame_idx * 32 + 1 AS BIGINT), 32) AS frame_hex
FROM f
WHERE frame_idx % 3 = 0
ORDER BY doc_id, frame_idx
"""


QUERIES = {
    "q50_llm_enrich": q50_llm_enrich,
    "q51_llm_correction": q51_llm_correction,
    "q52_multimodal": q52_multimodal,
    "q84_frame_sample": q84_frame_sample,
}

ORACLE = {
    "q50_llm_enrich": _Q50_SQL,
    "q51_llm_correction": _Q51_SQL,
    "q52_multimodal": _Q52_SQL,
    "q84_frame_sample": _Q84_SQL,
}
