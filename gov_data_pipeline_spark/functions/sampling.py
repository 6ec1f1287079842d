"""Deterministic hash-bucket sampling primitives.

Membership is a pure function of a stable id — reproducible across
runs, clusters, and engines (md5 on both sides of the differential
oracle). The single definition every sampling query (q65, q69, q75)
and example shares; the DuckDB twin is
``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 2))::INT``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hash_bucket_col(id_col: Column) -> Column:
    """Uniform bucket 0..255 from the first md5 byte of the id."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 2), 16, 10
    ).cast("int")
