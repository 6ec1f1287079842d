"""Document ingestion (SURVEY R4-R8, R18): Excel/DOCX/PDF -> rows.

Split by dependency surface:

- **bytes -> tables** needs codec libraries (openpyxl / python-docx /
  pdfplumber) that are NOT in this runtime — those entry points are
  import-gated and raise ``NotImplementedError`` with a clear message
  (the reference used an external web service for PDF->DOCX,
  ``utils/pdf2docx.py``; this engine deliberately replaces that with a
  local parser — no third-party service in the data path);
- **tables -> DataFrame** is pure logic (ragged-row padding, header
  dedup, ingest-order row index) re-expressing
  ``handlers/kyrgyzstan.py:239-270``, fully testable here;
- **image attach** (R18/R19) is a row-index left join; the anchor
  row math (including the reference's ``rowOff > 10000 -> +1 row``
  heuristic and per-source ROW_OFFSET) lives in
  ``xlsx_image_anchor_row`` so it stays unit-testable without openpyxl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gov_data_pipeline_spark.transforms.headers import dedup_column_names

# Per-source row offsets between the sheet row of an image anchor and
# the promoted-DataFrame row (reference: belarus.py:25 = 2,
# kazakhstan.py:29 = 5, kyrgyzstan.py:87 = 0) — business rules, config
# not code.
ROW_OFFSETS = {"belarus": 2, "kazakhstan": 5, "kyrgyzstan": 0}


def assemble_rows(
    spark: SparkSession,
    rows: list[list[str | None]],
    skip_rows: int = 2,
    idx_col: str = "row_idx",
) -> DataFrame:
    """Pure re-expression of the reference's table assembly
    (``handlers/kyrgyzstan.py:249-270``): pad ragged rows to the max
    width, promote row 0 to deduped column names, drop the first
    ``skip_rows`` rows, attach the ingest-order index.

    The driver-side list is fine: document tables are small (one
    registry workbook); massive file sets ingest per-file in parallel
    tasks, each calling this on its own document.
    """
    if not rows:
        raise ValueError("assemble_rows: empty input")
    max_len = max(len(r) for r in rows)
    padded = [list(r) + [""] * (max_len - len(r)) for r in rows]
    names = dedup_column_names(
        [str(c) if c is not None else "" for c in padded[0]]
    )
    data = [
        [i, *[str(c) if c is not None else "" for c in r]]
        for i, r in enumerate(padded)
    ]
    schema = f"{idx_col} long, " + ", ".join(f"`{n}` string" for n in names)
    df = spark.createDataFrame(data, schema)
    return df.filter(F.col(idx_col) >= skip_rows)


def xlsx_image_anchor_row(anchor_row: int, row_off_emu: int, source_offset: int) -> int:
    """Map an xlsx image anchor to the promoted-DataFrame row index.

    Reference math (``handlers/base.py:233-239``): anchors hanging more
    than 10000 EMU below the cell top count as the next row; then the
    per-source header offset is subtracted.
    """
    row = anchor_row + (1 if row_off_emu > 10000 else 0)
    return row - source_offset


def extract_xlsx_images(workbook_bytes: bytes, source: str) -> list[tuple[int, str]]:
    """R18: pull embedded images out of a workbook as
    (dataframe_row_idx, base64_png_data_uri). Requires openpyxl (+ a
    PNG transcoder); gated until present in the runtime."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "extract_xlsx_images needs openpyxl, which is not in this "
            "runtime. The anchor math is implemented and tested in "
            "xlsx_image_anchor_row; wire the extraction loop when the "
            "library is available."
        ) from e
    raise NotImplementedError("openpyxl extraction loop not yet wired")


def attach_images(
    df: DataFrame,
    images: DataFrame,
    idx_col: str = "row_idx",
    image_col: str = "Изображение",
) -> DataFrame:
    """R18/R19: left-join the (row_idx, image) table onto the data by
    row index; rows without an image get ''. This replaces the
    reference's positional column splice (``handlers/base.py:256-272``)
    with a join that survives distribution."""
    imgs = images.select(
        F.col(idx_col), F.col(image_col)
    )
    return df.join(imgs, idx_col, "left").withColumn(
        image_col, F.coalesce(F.col(image_col), F.lit(""))
    )


def docx_tables(docx_bytes: bytes) -> list[list[list[str]]]:
    """R7: DOCX -> list of tables (rows of cell strings). Requires
    python-docx; gated until present."""
    try:
        import docx  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "docx_tables needs python-docx, which is not in this "
            "runtime. Downstream assembly (assemble_rows) is implemented "
            "and tested against list-of-rows input."
        ) from e
    raise NotImplementedError("python-docx table loop not yet wired")


def pdf_tables(pdf_bytes: bytes) -> list[list[list[str]]]:
    """R6 (re-designed): PDF -> tables with a *local* parser instead of
    the reference's external conversion service. Requires pdfplumber;
    gated until present."""
    try:
        import pdfplumber  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "pdf_tables needs pdfplumber, which is not in this runtime."
        ) from e
    raise NotImplementedError("pdfplumber extraction loop not yet wired")
