"""Shared drift-scoring primitives: ONE definition of the decile
bucketing rule and the PSI term, imported by both the batch query
(q114, `queries/stats_ml.py`) and the streaming monitor
(`streaming/monitor.py`) so the batch-twin relationship is enforced by
construction rather than by parallel maintenance.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

N_BUCKETS = 10
LN_FLOOR = 1e-6


def bucket_by_edges(edges_col: str | Column, value_col: str | Column = "value") -> Column:
    """Bucket index 0..9: how many reference decile edges the value
    exceeds. The single edge rule (strict ``>``) both engines mirror."""
    edges = F.col(edges_col) if isinstance(edges_col, str) else edges_col
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.size(F.filter(edges, lambda e: value > e))


def psi_term(p_cur: Column, p_ref: Column) -> Column:
    """One bucket's PSI contribution: (p_cur − p_ref)·ln(p_cur / p_ref)
    with ln operands floored at 1e-6 so an emptied bucket contributes a
    large-but-finite term — identical expression in batch and stream."""
    return (p_cur - p_ref) * F.log(
        F.greatest(p_cur, F.lit(LN_FLOOR)) / F.greatest(p_ref, F.lit(LN_FLOOR))
    )
