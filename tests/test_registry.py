"""Driver-contract registry invariants: the queries()/oracle_sql()
dicts are built by merging per-module dicts — a duplicate key would
silently drop a query from the driver's correctness sweep."""

import re

import pytest

from gov_data_pipeline_spark.queries import _MODULES, _PRIORITY, all_oracles, all_queries


def test_no_duplicate_query_keys_across_modules():
    total = sum(len(m.QUERIES) for m in _MODULES)
    assert len(all_queries()) == total, (
        "merged registry smaller than the sum of module registries: "
        "two modules define the same query name"
    )
    total_o = sum(len(m.ORACLE) for m in _MODULES)
    assert len(all_oracles()) == total_o, (
        "merged oracle registry smaller than the sum of module oracles"
    )


def test_query_naming_convention_and_callables():
    qs = all_queries()
    for name, fn in qs.items():
        assert re.fullmatch(r"q\d+_[a-z0-9_]+", name), name
        assert callable(fn), name


def test_every_priority_name_resolves():
    """A _PRIORITY entry naming a query no module defines must raise
    loudly — round 3 shipped four phantom priority names that
    all_queries() silently swallowed, leaving new surface without any
    oracle coverage."""
    qs = all_queries()
    for name in _PRIORITY:
        assert name in qs, f"_PRIORITY names unknown query {name}"
    # priority names enumerate first — the driver samples the first 50
    assert list(qs)[: len(_PRIORITY)] == list(_PRIORITY)


def test_phantom_priority_name_raises(monkeypatch):
    import gov_data_pipeline_spark.queries as reg

    monkeypatch.setattr(reg, "_PRIORITY", ("q99_does_not_exist",))
    with pytest.raises(ValueError, match="q99_does_not_exist"):
        reg.all_queries()


def test_oracle_coverage_is_total():
    """Every registered query carries a DuckDB oracle — including q26,
    whose sketches are checked through a bounds oracle (exact values +
    within-guarantee booleans). A new no-oracle query must relax this
    test deliberately."""
    missing = set(all_queries()) - set(all_oracles())
    assert missing == set(), missing


def test_registered_schemas_are_sortable_scalars(spark):
    """Driver-comparator contract: the canonicalizer sorts each result
    column with pandas before hashing, which throws on array/map/struct
    cells (r01's q26 row died exactly that way). Every registered query
    must therefore output only scalar, orderable column types. Running
    each query at sf0.001 resolves the ACTUAL result schema (several
    queries build schemas dynamically), so this is the contract test,
    not a convention note.

    A future query that genuinely needs a complex output column should
    serialize it (to_json / array_join / hash) — and if the driver's
    comparator ever learns complex types, relax this pin deliberately.
    """
    from pyspark.sql import types as T

    scalar_ok = (
        T.StringType, T.BooleanType, T.ByteType, T.ShortType,
        T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
        T.DecimalType, T.DateType, T.TimestampType, T.TimestampNTZType,
        T.BinaryType,
    )
    bad: list[str] = []
    for name, fn in all_queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if not isinstance(f.dataType, scalar_ok):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"non-scalar output columns break the driver hash: {bad}"
