"""Differential oracle harness: Spark result vs DuckDB result.

Mirrors the driver's t2 compare: row count + schema-shape + an
order-insensitive value hash. Columns are sorted by name before
comparison (the driver does the same), rows are sorted by all columns,
floats are rounded to 6 significant decimals before hashing so that
partial-aggregation ulp noise never matters (queries additionally round
their own double outputs — this is belt and braces).
"""

from __future__ import annotations

import hashlib
import math
from typing import Any

import duckdb
import pandas as pd

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the ten fixture tables as views. Accepts both layouts:
    a single ``{t}.parquet`` file (the driver's testdata) and a
    Spark-written ``{t}.parquet/`` directory of part files (what test
    fixtures built with ``df.write.parquet`` produce)."""
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_value(v: Any) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\\N"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonicalize(pdf: pd.DataFrame) -> list[str]:
    pdf = pdf[sorted(pdf.columns)]
    rows = [
        "\x1f".join(_canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def value_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in canonicalize(pdf):
        h.update(row.encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def _num_kind(dtype: Any) -> str | None:
    """'int' / 'float' for numeric numpy dtypes, else None."""
    kind = getattr(dtype, "kind", "")
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    return None


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> dict[str, Any]:
    """Compare two result frames; returns a diagnostics dict.

    Stricter than the pure value hash: an int-vs-float dtype mismatch
    between the Spark and DuckDB frames FAILS even when ``%.6g``
    renders the values identically ("1620" vs "1620.0").  Round 5
    shipped five oracles whose DuckDB ``sum()`` promoted to HUGEINT
    (fetched as float64) while Spark returned BIGINT — locally green,
    driver-red, because the driver's canonicalizer hashes the two
    representations differently.  This pin makes the local mirror at
    least as strict as the driver on that axis.
    """
    res: dict[str, Any] = {
        "rows": (len(spark_pdf), len(duck_pdf)),
        "cols": (sorted(spark_pdf.columns), sorted(duck_pdf.columns)),
    }
    res["rows_match"] = len(spark_pdf) == len(duck_pdf)
    res["cols_match"] = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    dtype_clash: list[tuple[str, str, str]] = []
    if res["cols_match"]:
        for c in sorted(spark_pdf.columns):
            ka = _num_kind(spark_pdf[c].dtype)
            kb = _num_kind(duck_pdf[c].dtype)
            if ka and kb and ka != kb:
                dtype_clash.append(
                    (c, str(spark_pdf[c].dtype), str(duck_pdf[c].dtype))
                )
    res["dtype_clash"] = dtype_clash
    res["hash_match"] = (
        res["rows_match"]
        and res["cols_match"]
        and not dtype_clash
        and value_hash(spark_pdf) == value_hash(duck_pdf)
    )
    if not res["hash_match"] and res["rows_match"] and res["cols_match"]:
        a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        res["first_diffs"] = diffs[:5]
    return res


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    return con.execute(sql).fetch_df()
