"""Declarative data-quality expectations: evaluate a suite of row-level
checks in ONE pass over the table and emit a (check, violations,
pass_rate) report — the contract-testing layer a pipeline runs on
every ingest before anything downstream sees the data.

Scale shape: all row-level checks compile into a single conditional
aggregate (one scan, map-side partials) whose output is ONE row
carrying an array<struct<check,n_violations>>; the wide→long reshape
is an ``explode`` of that one-row array — a Generate over the
aggregate, never a union of per-check branches (a union re-plans into
N independent aggregates, i.e. N scans; ``tests/test_plans.py`` pins
the single scan). Referential integrity is the one check that needs a
second relation; it is a LEFT ANTI join on the key (broadcast when the
parent's keys are small, key-shuffle otherwise — Catalyst/AQE picks),
counting orphans without materializing them.

The reference has no quality layer (its gates are lint-only,
`/root/reference/Justfile:1-14`); this extends SURVEY §2.2's L8/T7
filter family into the declarative form production pipelines actually
configure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def expectations_report(
    df: DataFrame, checks: list[tuple[str, Column]]
) -> DataFrame:
    """Evaluate named row-level boolean expectations in one aggregate.

    ``checks`` maps check name → boolean Column that is True when the
    row PASSES. A NULL verdict (e.g. a comparison on a NULL value)
    counts as a violation — expectations are strict by default, which
    is the posture a quality gate wants.

    Returns one row per check: (check, n_rows, n_violations,
    pass_rate) ordered by check name.

    Check names carry through as string literals inside the aggregate
    (never as intermediate column aliases), so a name can never collide
    with an internal alias; duplicates and reserved output names are
    still rejected up front because they would make the report itself
    ambiguous.
    """
    if not checks:
        raise ValueError("expectations_report needs at least one check")
    reserved = {"check", "n_rows", "n_violations", "pass_rate"}
    seen: set[str] = set()
    for name, _ in checks:
        if not name or not isinstance(name, str):
            raise ValueError(f"check name must be a non-empty str: {name!r}")
        if name in seen:
            raise ValueError(f"duplicate check name: {name!r}")
        if name in reserved:
            raise ValueError(
                f"check name {name!r} collides with a report column"
            )
        seen.add(name)
    counters = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.sum(F.when(ok, 0).otherwise(1)).alias("n_violations"),
            )
            for name, ok in checks
        ]
    )
    row = df.agg(
        F.count(F.lit(1)).alias("n_rows"), counters.alias("__counters")
    )
    return (
        row.select("n_rows", F.explode("__counters").alias("kv"))
        .select(
            F.col("kv.check").alias("check"),
            "n_rows",
            F.col("kv.n_violations").alias("n_violations"),
            F.round(
                (F.col("n_rows") - F.col("kv.n_violations"))
                / F.col("n_rows"),
                6,
            ).alias("pass_rate"),
        )
        .orderBy("check")
    )


def fk_violation_count(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential-integrity check: count child rows whose key has no
    match in the parent (NULL keys are orphans too — strict posture).
    LEFT ANTI join on the key; only the key columns cross the wire."""
    orphans = child.select(F.col(child_key).alias("__k")).join(
        parent.select(F.col(parent_key).alias("__k")),
        "__k",
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations"))


def profile_columns(
    df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """SUMMARIZE-style column profile in ONE aggregate pass: for each
    column, (column, n_rows, n_null, n_distinct, min_str, max_str) —
    the ingest-time dataset datasheet that feeds expectation
    thresholds (a q128 suite is usually written FROM a profile).

    Min/max are emitted as strings so one long-form schema covers
    every column type; Spark's and DuckDB's casts agree on
    long/string/timestamp and on shortest-round-trip doubles, which is
    what makes the differential oracle (q166) exact. NULLs: ``n_null``
    counts them, min/max ignore them (both engines'), and n_distinct
    does NOT count NULL as a value (COUNT DISTINCT semantics in both).

    Scale shape: one scan; every metric is a map-side-partial
    aggregate. ``exact_distinct=True`` compiles multiple COUNT
    DISTINCTs into Catalyst's Expand (input amplified x|columns| before
    the partial aggregate — fine to tens of columns at any row count,
    it is still one scan and one exchange of the expanded partials).
    At extreme width or when amplification matters, pass
    ``exact_distinct=False`` for HLL sketches
    (``approx_count_distinct``, default rsd 5%) — the profile then
    stops being oracle-exact, which is why exact is the default. The
    wide one-row result reshapes to long form by exploding an
    array<struct> built from the aggregate output — the q128 pattern,
    never a per-column union of scans.
    """
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: unknown column(s) {missing}")
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{i}"),
            nd(c).alias(f"__nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{i}"),
        ]
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__null_{i}").alias("n_null"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                F.col(f"__min_{i}").alias("min_str"),
                F.col(f"__max_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return (
        one.select(F.col("__n").alias("n_rows"), F.explode(entries).alias("e"))
        .select(
            F.col("e.column").alias("column"),
            "n_rows",
            F.col("e.n_null").alias("n_null"),
            F.col("e.n_distinct").alias("n_distinct"),
            F.col("e.min_str").alias("min_str"),
            F.col("e.max_str").alias("max_str"),
        )
        .orderBy("column")
    )
