"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def qcol(name: str) -> Column:
    """``F.col`` that treats ``name`` literally.

    Registry column names contain dots (``Рег. №``), which bare
    ``F.col`` parses as struct-field access. Backtick-quote (escaping
    embedded backticks) so the full string is one column name.
    """
    return F.col("`" + name.replace("`", "``") + "`")
