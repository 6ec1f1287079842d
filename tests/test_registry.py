"""Driver-contract registry invariants: the queries()/oracle_sql()
dicts are built by merging per-module dicts — a duplicate key would
silently drop a query from the driver's correctness sweep."""

import re

from gov_data_pipeline_spark.queries import all_oracles, all_queries


def _module_dicts():
    from gov_data_pipeline_spark.queries import (
        dedup_sim,
        llm_queries,
        relational,
        scalar,
        stream_queries,
        textops,
    )

    mods = [relational, scalar, textops, dedup_sim, llm_queries, stream_queries]
    return mods


def test_no_duplicate_query_keys_across_modules():
    mods = _module_dicts()
    total = sum(len(m.QUERIES) for m in mods)
    assert len(all_queries()) == total, "duplicate query name across modules"
    total_o = sum(len(m.ORACLE) for m in mods)
    assert len(all_oracles()) == total_o, "duplicate oracle name across modules"


def test_every_oracle_has_a_query():
    qs, os_ = set(all_queries()), set(all_oracles())
    assert os_ <= qs, f"oracles without queries: {os_ - qs}"


def test_query_naming_convention_and_callables():
    qs = all_queries()
    for name, fn in qs.items():
        assert re.fullmatch(r"q\d+_[a-z0-9_]+", name), name
        assert callable(fn), name


def test_oracle_coverage_is_total_except_sketches():
    """Every registered query carries a DuckDB oracle except q26's
    engine-specific HLL++/quantile sketches — the contract the docs
    claim. A new no-oracle query must be added here deliberately."""
    missing = set(all_queries()) - set(all_oracles())
    assert missing == {"q26_approx_agg"}, missing
