"""Query registry.

Each submodule declares two dicts:

- ``QUERIES``: name -> ``Callable[[SparkSession, str], DataFrame]``
  (the PySpark implementation; ``str`` is the fixture directory);
- ``ORACLE``: name -> ANSI SQL string DuckDB can run on the same
  parquet tables, producing the identical result (same column names —
  the driver's comparator sorts columns by name before hashing).

Names missing from ``ORACLE`` get the driver's weaker rows-only check;
that set is kept to the genuinely non-SQL-expressible operators
(hash-sketch dedup, streaming statefulness).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gov_data_pipeline_spark.queries import (
    dedup_sim,
    llm_queries,
    relational,
    scalar,
    stream_queries,
    textops,
)

_MODULES = (relational, scalar, textops, dedup_sim, llm_queries, stream_queries)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
