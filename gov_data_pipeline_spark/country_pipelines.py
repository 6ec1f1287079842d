"""The three reference country pipelines, re-expressed as engine
pipelines (SURVEY §3.2 — ``handlers/belarus.py`` / ``kazakhstan.py`` /
``kyrgyzstan.py``).

Each pipeline is the reference's transform sequence over an already-
ingested raw table (rows + ingest-order ``row_idx`` — produced by
``sources.excel.read_excel`` / ``sources.documents.assemble_rows`` when
the codec libraries are present, or injected directly in tests):

- **belarus** (``belarus.py:89-131``): promote headers (skip 2) ->
  trim all strings -> attach images by row index -> LLM enrichment;
- **kazakhstan** (``kazakhstan.py``): belarus steps + column-name
  repair + NFKC ``clean_text`` on every column;
- **kyrgyzstan** (``kyrgyzstan.py``): cell cleaning -> rename map ->
  reg-num normalization -> continuation-row merge -> enrichment.

The LLM client is injected; production wires a real provider client,
tests and the t2 oracle use the deterministic mock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gov_data_pipeline_spark.util import qcol

from gov_data_pipeline_spark.llm import enrich_table
from gov_data_pipeline_spark.llm.runtime import ClientFactory
from gov_data_pipeline_spark.sources.documents import attach_images
from gov_data_pipeline_spark.transforms import (
    clean_cell_col,
    clean_text_col,
    merge_continuation_rows,
    normalize_reg_num_col,
    promote_headers,
    strip_all_strings,
)

# Reference column names (belarus.py:22-24, kazakhstan.py:26-28,
# kyrgyzstan.py:284-296).
BELARUS_BRAND = (
    "Вид объекта интеллектуальной собственности, его наименование "
    "(описание, изображение)"
)
BELARUS_DESC = (
    "Наименование (описание) товаров, содержащих объект "
    "интеллектуальной собственности"
)
KAZ_BRAND = (
    "Наименование (вид, описание, изображение) объекта "
    "интеллектуальной собственности"
)
KAZ_DESC = "Наименование товаров, класс товаров по МКТУ или код товаров по ТН ВЭД"
KG_KEY = "Рег. №"
KG_BRAND = "Наименование (вид, описание, изображение) ОИС"

KG_RENAMES = {
    "Наименова ние, №, дата документа об охраноспос обности ОИС":
        "Наименование, №, дата документа об охраноспособности ОИС",
    "Наименование товаров, в отношении которых принимаются меры Класс товаров "
    "по МКТУ/Код товаров по ТНВЭД":
        "Наименование товаров, в отношении которых принимаются меры "
        "(класс товаров по МКТУ/Код товаров по ТНВЭД)",
    "Правообладате ль": "Правообладатель",
    "Срок несения ОИС в Реестр": "Срок внесения ОИС",
}


def _strings(df: DataFrame, idx_col: str) -> list[str]:
    return [c for c in df.columns if c != idx_col]


def belarus_pipeline(
    raw: DataFrame,
    images: DataFrame | None,
    client_factory: ClientFactory,
    idx_col: str = "row_idx",
    image_col: str = "Изображение",
    correction: bool = False,
) -> DataFrame:
    df = promote_headers(raw, idx_col, skip_rows=2, repair=False)
    # shared helper: replicates Python str.strip() incl. Unicode
    # whitespace (NBSP etc.), which registry workbooks do contain
    df = strip_all_strings(df)
    if images is not None:
        df = attach_images(df, images, idx_col, image_col)
    else:
        df = df.withColumn(image_col, F.lit(""))
    enriched = enrich_table(
        df.drop(idx_col),
        brand_col=BELARUS_BRAND,
        image_col=image_col,
        desc_col=BELARUS_DESC,
        client_factory=client_factory,
        correction=correction,
    )
    return enriched


def kazakhstan_pipeline(
    raw: DataFrame,
    images: DataFrame | None,
    client_factory: ClientFactory,
    idx_col: str = "row_idx",
    image_col: str = "Изображение",
    correction: bool = False,
) -> DataFrame:
    # repair=True: clean_column_name runs BEFORE dedup, so split-word
    # headers that clean to the same name get disambiguated instead of
    # colliding (kazakhstan's own repair case can produce collisions)
    df = promote_headers(raw, idx_col, skip_rows=2, repair=True)
    # clean_text on every string column EXCEPT the image data-URI column
    # (the reference runs it before the image column exists).
    df = df.select(
        F.col(idx_col),
        *[clean_text_col(qcol(c)).alias(c) for c in _strings(df, idx_col)],
    )
    if images is not None:
        df = attach_images(df, images, idx_col, image_col)
    else:
        df = df.withColumn(image_col, F.lit(""))
    return enrich_table(
        df.drop(idx_col),
        brand_col=KAZ_BRAND,
        image_col=image_col,
        desc_col=KAZ_DESC,
        client_factory=client_factory,
        correction=correction,
    )


def kyrgyzstan_pipeline(
    raw: DataFrame,
    client_factory: ClientFactory,
    idx_col: str = "row_idx",
    correction: bool = False,
) -> DataFrame:
    """``raw`` is the assembled table (headers already promoted by
    ``sources.documents.assemble_rows``, which replicates
    ``kyrgyzstan.py:249-270``)."""
    cols = _strings(raw, idx_col)
    df = raw.select(
        F.col(idx_col), *[clean_cell_col(qcol(c)).alias(c) for c in cols]
    )
    df = df.withColumnsRenamed({k: v for k, v in KG_RENAMES.items() if k in df.columns})
    if KG_KEY not in df.columns:
        raise ValueError(
            f"kyrgyzstan_pipeline: key column {KG_KEY!r} missing after renames; "
            f"got columns {df.columns}"
        )
    df = df.withColumn(KG_KEY, normalize_reg_num_col(qcol(KG_KEY)))
    df = merge_continuation_rows(df, key_col=KG_KEY, idx_col=idx_col)
    return enrich_table(
        df.drop(idx_col),
        brand_col=KG_BRAND,
        image_col=KG_BRAND,  # kyrgyzstan has no separate image column
        desc_col=None,
        client_factory=client_factory,
        correction=correction,
    )
