"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 gate, so a green run here predicts a green
CORRECTNESS_r{N}.json. Queries without an oracle get a rows-only sanity
check (the driver applies the same weaker check).

Thread-pooled into batches (r14, VERDICT item 1a — the driver's pytest
budget): the previous one-test-per-query form ran 198 sequential
Spark-action + DuckDB pairs and dominated the suite's wall-clock;
batches of ~25 names with 4 concurrent checks overlap the Spark jobs
(actions are thread-safe; job descriptions/pins are per-name, and the
engine's _pin_one_live keys are per-query so concurrent DIFFERENT
queries never evict each other). Each thread opens its own DuckDB
connection — a connection is not safe for concurrent queries, and
building one is just parquet views (~ms). Failure granularity is kept:
a red batch lists every failing name with its compare record.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from gov_data_pipeline_spark.queries import all_oracles, all_queries
from tests.oracle import compare, duckdb_con, run_oracle

_QUERIES = all_queries()
_ORACLES = all_oracles()
_N_BATCHES = 8


@pytest.mark.parametrize("batch", range(_N_BATCHES))
def test_query_matches_oracle_batch(batch, spark, sf_dir):
    names = sorted(_QUERIES)[batch::_N_BATCHES]

    def _check(name: str) -> str | None:
        con = duckdb_con(sf_dir)
        try:
            spark_pdf = _QUERIES[name](spark, sf_dir).toPandas()
            if name not in _ORACLES:
                return None  # rows-only check: building the frame is the test
            duck_pdf = run_oracle(con, _ORACLES[name])
            res = compare(spark_pdf, duck_pdf)
            return None if res["hash_match"] else f"{name}: {res}"
        except Exception as e:  # noqa: BLE001 - collect, report all names
            return f"{name}: {type(e).__name__}: {e}"
        finally:
            con.close()

    with ThreadPoolExecutor(max_workers=4) as pool:
        failures = sorted(r for r in pool.map(_check, names) if r)
    assert not failures, failures


def test_all_oracle_keys_have_queries():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracle entries without queries: {missing}"
