"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 gate, so a green run here predicts a green
CORRECTNESS_r{N}.json. Queries without an oracle get a rows-only sanity
check (the driver applies the same weaker check).
"""

from __future__ import annotations

import pytest

from gov_data_pipeline_spark.queries import all_oracles, all_queries
from tests.oracle import compare, run_oracle

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = _QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in _ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    duck_pdf = run_oracle(duck, _ORACLES[name])
    res = compare(spark_pdf, duck_pdf)
    assert res["hash_match"], f"{name}: {res}"


def test_all_oracle_keys_have_queries():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracle entries without queries: {missing}"
