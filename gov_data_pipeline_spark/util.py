"""Small shared helpers."""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, functions as F

_PIN_LOCK = threading.Lock()
_PIN_STATE: dict = {"depth": 0, "prev": None}


def pin_partitioned(df: DataFrame, *part_cols: str) -> DataFrame:
    """``localCheckpoint`` that PRESERVES a hash partitioning, so every
    downstream groupBy/join/window keyed on ``part_cols`` (or a
    superset — ``HashPartitioning(k)`` satisfies clustering on
    ``(k, ...)``) plans with ZERO exchanges (guide §2.4: remove
    shuffles outright).

    Two facts make this work (probed on Spark 4.1, r14):

    1. ``Dataset.localCheckpoint`` captures the physical plan's output
       partitioning into the replacement ``LogicalRDD`` — but ONLY
       when the executed plan is not wrapped in
       ``AdaptiveSparkPlanExec`` (under AQE the capture degrades to
       unknown partitioning and every consumer re-shuffles). AQE is
       therefore disabled around the pin's construction job and
       restored after; consumers still plan/run under AQE.
    2. ``repartition(cols)`` with no explicit count uses the session
       ``spark.sql.shuffle.partitions`` default, so two pins built in
       the same session are co-partitioned (same expressions, same
       width) and join exchange-free. The width is the session
       default — configuration, not a local constant; a cluster
       session sets it to cluster scale and AQE never needed to
       coalesce these pins anyway (they are sized by their consumers).

    With no ``part_cols`` the input's existing partitioning is
    captured as-is (useful when the plan already ends in the wanted
    exchange/aggregate). Cost model: one exchange of the pinned
    relation at construction buys every downstream consumer's exchange
    on that key — a win from two consumers up, and strictly a win when
    the plan already needed the exchange once.

    Correctness-neutral: partitioning never changes row content, and a
    failed capture only re-inserts exchanges (EnsureRequirements), so
    the worst case is the old plan, never a wrong result.

    Thread-safe for OVERLAPPED pins (the guide §2.6 pattern q190
    uses): the AQE toggle is reference-counted under a lock — the
    first concurrent pin disables AQE, the last restores it — so a
    sibling thread's restore can never re-enable AQE under a pin that
    is still planning (a lost capture would be a silent perf
    regression). Assumes the engine's one-session-per-process shape."""
    spark = df.sparkSession
    if part_cols:
        df = df.repartition(*[F.col(c) for c in part_cols])
    with _PIN_LOCK:
        if _PIN_STATE["depth"] == 0:
            _PIN_STATE["prev"] = spark.conf.get("spark.sql.adaptive.enabled")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        _PIN_STATE["depth"] += 1
    try:
        return df.localCheckpoint()
    finally:
        with _PIN_LOCK:
            _PIN_STATE["depth"] -= 1
            if _PIN_STATE["depth"] == 0:
                spark.conf.set(
                    "spark.sql.adaptive.enabled", _PIN_STATE["prev"]
                )


def qcol(name: str) -> Column:
    """``F.col`` that treats ``name`` literally.

    Registry column names contain dots (``Рег. №``), which bare
    ``F.col`` parses as struct-field access. Backtick-quote (escaping
    embedded backticks) so the full string is one column name.
    """
    return F.col("`" + name.replace("`", "``") + "`")
