"""Excel source/sink (SURVEY T4, R4/R26).

Workbooks are a small-data driver-side format: the reference reads one
registry workbook per country per week. The bridge is pandas <->
``createDataFrame`` (Arrow path). Engines are import-gated — if no
Excel engine is available in the runtime, raise a clear error instead
of failing mid-pipeline.

Header-promotion note: ``skip_rows`` here mirrors the reference's
``read_options={"skip_rows": k}`` (``handlers/belarus.py:106-110``);
downstream header repair uses ``transforms.headers.promote_headers``.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession, functions as F


def _require_pandas_excel():
    import pandas as pd  # noqa: F401

    try:
        import openpyxl  # noqa: F401

        return "openpyxl"
    except ImportError:
        pass
    try:
        import xlsxwriter  # noqa: F401

        return "xlsxwriter"
    except ImportError as e:
        raise NotImplementedError(
            "No Excel engine (openpyxl/xlsxwriter) available in this "
            "runtime; install one or ingest CSV/parquet instead."
        ) from e


def read_excel(
    spark: SparkSession,
    source: str | bytes,
    skip_rows: int = 0,
    sheet: int | str = 0,
    all_strings: bool = True,
    idx_col: str = "row_idx",
) -> DataFrame:
    """Read a workbook (path or bytes) into a DataFrame with an explicit
    ingest-order ``row_idx`` — pinned before any Spark shuffle so
    order-dependent transforms (header promotion, continuation merge)
    stay correct."""
    import pandas as pd

    _require_pandas_excel()
    buf = io.BytesIO(source) if isinstance(source, (bytes, bytearray)) else source
    pdf = pd.read_excel(buf, sheet_name=sheet, skiprows=skip_rows, header=None, dtype=str)
    pdf.columns = [f"c{i}" for i in range(len(pdf.columns))]
    if all_strings:
        pdf = pdf.astype("string")
    pdf.insert(0, idx_col, range(len(pdf)))
    df = spark.createDataFrame(pdf)
    if all_strings:
        df = df.select(
            F.col(idx_col).cast("long"),
            *[F.col(c).cast("string").alias(c) for c in df.columns if c != idx_col],
        )
    return df


def write_excel(df: DataFrame, path_or_buf, max_rows: int = 1_048_576) -> None:
    """Collect-and-write sink (driver-side, as in ``main.py:38-47``).

    Guarded by Excel's own row limit: this is for report-sized outputs,
    never for datasets — large results go to ``write_parquet``.
    """
    _require_pandas_excel()
    pdf = df.limit(max_rows + 1).toPandas()  # one job: collect + guard
    if len(pdf) > max_rows:
        raise ValueError(
            f"write_excel: result exceeds the Excel sheet limit "
            f"({max_rows}); use write_parquet for datasets."
        )
    pdf.to_excel(path_or_buf, index=False)
