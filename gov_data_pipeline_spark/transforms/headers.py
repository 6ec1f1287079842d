"""Header/schema repair transforms (SURVEY T2, R5, R8, R9).

The reference discovers schemas at runtime from messy files: header
promotion with skip-rows, duplicate/empty column-name repair, ragged-row
padding. Here those become Spark-side utilities that operate on a
DataFrame carrying an explicit row-index column — order must be pinned
at ingest (before any shuffle), which is the same constraint the
reference satisfies implicitly by being single-threaded.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from gov_data_pipeline_spark.util import qcol


def clean_column_name(name: str) -> str:
    """Kazakhstan header repair (``handlers/kazakhstan.py:139-148``):
    strip; rejoin the split word ``Наименова ние``; ``/`` -> `` или ``;
    newlines -> space; collapse runs of spaces; drop non-printables."""
    name = name.strip()
    name = re.sub(r"Наименова\s*ние", "Наименование", name)
    name = name.replace("/", " или ")
    name = name.replace("\n", " ")
    name = re.sub(r"\s{2,}", " ", name)
    return "".join(ch for ch in name if ch.isprintable())


def dedup_column_names(names: list[str | None]) -> list[str]:
    """Disambiguate empty/duplicate column names
    (``handlers/kyrgyzstan.py:255-267``): empty or repeated names become
    ``{name or 'Unnamed'}_{i}`` with the first free counter.

    Deviation from the reference: membership is checked on the
    *stripped* name. The reference compares unstripped but stores
    stripped, so whitespace-variant headers (``'a'``, ``' a'``) slip
    through as duplicates — which then crashes its DataFrame
    construction anyway; deduping is the function's whole intent.
    """
    unique: list[str] = []
    seen: set[str] = set()
    for col in names:
        col = (col or "").strip()
        if not col or col in seen:
            counter = 1
            new_col = f"{col or 'Unnamed'}_{counter}"
            while new_col in seen:
                counter += 1
                new_col = f"{col or 'Unnamed'}_{counter}"
            unique.append(new_col)
        else:
            unique.append(col)
        seen.add(unique[-1])
    return unique


def promote_headers(
    df: DataFrame,
    idx_col: str,
    skip_rows: int = 2,
    repair: bool = True,
) -> DataFrame:
    """Row 0 becomes the column names; the first ``skip_rows`` rows are
    dropped (``handlers/belarus.py:112-115``: header from row 0, then
    ``slice(2)``).

    ``df`` must carry a total-order column ``idx_col`` assigned at
    ingest. Only the single header row is collected to the driver — the
    data path stays distributed, so this works unchanged on a 100 TB
    un-headered file set (the header row is found by index, which the
    parquet/csv ingest assigns per file before any shuffle).
    """
    data_cols = [c for c in df.columns if c != idx_col]
    header = (
        df.filter(F.col(idx_col) == 0).select(*data_cols).limit(1).collect()
    )
    if not header:
        raise ValueError("promote_headers: no row with index 0")
    raw_names = [
        str(v) if v is not None else "UNKNOWN" for v in header[0]
    ]
    if repair:
        raw_names = [clean_column_name(n) if n != "UNKNOWN" else n for n in raw_names]
    names = dedup_column_names(raw_names)
    out = df.filter(F.col(idx_col) >= skip_rows)
    renamed = out.select(
        F.col(idx_col),
        *[qcol(old).alias(new) for old, new in zip(data_cols, names)],
    )
    return renamed


def pad_ragged_rows(arr: Column, target_len: Column | int, fill: str = "") -> Column:
    """Pad an array column to ``target_len`` with ``fill``
    (``handlers/kyrgyzstan.py:249-251``). ``target_len`` is typically
    ``F.max(F.size(arr))`` computed once over the input — an aggregate,
    not a collect-per-row, so it scales."""
    tl = F.lit(target_len) if isinstance(target_len, int) else target_len
    pad = F.array_repeat(F.lit(fill), (tl - F.size(arr)).cast("int"))
    return F.when(F.size(arr) < tl, F.concat(arr, pad)).otherwise(arr)
