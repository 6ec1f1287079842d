"""Declarative data-quality expectations: evaluate a suite of row-level
checks in ONE pass over the table and emit a (check, violations,
pass_rate) report — the contract-testing layer a pipeline runs on
every ingest before anything downstream sees the data.

Scale shape: all row-level checks compile into a single conditional
aggregate (one scan, map-side partials, a handful of output rows), and
the wide→long reshape of the counters is a driver-side projection of
one aggregated row — no unpivot of the data itself. Referential
integrity is the one check that needs a second relation; it is a
LEFT ANTI join on the key (broadcast when the parent's keys are small,
key-shuffle otherwise — Catalyst/AQE picks), counting orphans without
materializing them.

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
    """
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for name, ok in checks:
        aggs.append(
            F.sum(F.when(ok, 0).otherwise(1)).alias(name)
        )
    row = df.agg(*aggs)
    per_check = [
        row.select(
            F.lit(name).alias("check"),
            F.col("__n_rows").alias("n_rows"),
            F.col(name).alias("n_violations"),
        )
        for name, _ in checks
    ]
    out = per_check[0]
    for p in per_check[1:]:
        out = out.unionByName(p)
    return out.select(
        "check",
        "n_rows",
        "n_violations",
        F.round(
            (F.col("n_rows") - F.col("n_violations")) / F.col("n_rows"), 6
        ).alias("pass_rate"),
    ).orderBy("check")


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
