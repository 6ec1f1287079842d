"""Continuation-row merge — the reference's one genuinely stateful
relational operator (``handlers/kyrgyzstan.py:183-217``), re-expressed
as a window + ordered group-concat (SURVEY T17/T18/T23).

Reference semantics, ported rule-for-rule:

- rows whose key cell starts with ``Name:`` are dropped outright
  (``kyrgyzstan.py:193-194``);
- a row whose key matches ``^(?:№?\\d{4,})(/ТЗ.*)?`` starts a new
  record (``kyrgyzstan.py:176-181``);
- other rows merge into the previous record: per column, non-empty
  trimmed values are appended with a single space
  (``kyrgyzstan.py:203-212``);
- leading continuation rows (before any new-record row) still form one
  record (the ``prev = row`` branch, ``kyrgyzstan.py:211-212``).

The sequential scan becomes: group id = running count of new-record
flags over the row order, then per-group ordered concat. One window +
one aggregation — no Python loop, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from gov_data_pipeline_spark.util import qcol

# (?U) = Java UNICODE_CHARACTER_CLASS so \d matches Unicode digits
# exactly like Python's re in the reference (found by property testing:
# Arabic-Indic digits count as record numbers there).
NEW_RECORD_PATTERN = r"(?U)^(?:№?\d{4,})(/ТЗ.*)?"


def is_new_record_col(col) -> "F.Column":
    """``re.match`` is start-anchored; rlike is search, so the pattern
    keeps its explicit ``^``. Reference ``handlers/kyrgyzstan.py:176-181``."""
    return F.trim(col).rlike(NEW_RECORD_PATTERN)


def merge_continuation_rows(
    df: DataFrame,
    key_col: str,
    idx_col: str,
    partition_col: str | None = None,
) -> DataFrame:
    """Merge continuation rows into their preceding record.

    ``idx_col`` is the ingest-order row index (pin it before any
    shuffle). ``partition_col`` (e.g. a source-file id) bounds the
    window: records never span files, so passing it makes the window
    per-file and the whole operator shuffle-parallel. Without it the
    window is global — correct, but single-task in the ordering step,
    which is the honest cost of a total order (the reference pays the
    same cost by being sequential).

    Input contract: cells must be pre-cleaned with ``clean_cell_col``
    (trimmed, whitespace-collapsed, null→"") — exactly what the
    reference guarantees by running ``clean_cell`` on every column
    before ``merge_continued_rows`` (``kyrgyzstan.py:273-281,309``).
    On pre-cleaned input this window+concat form is value-identical to
    the reference's sequential fold. On raw input it differs for
    standalone records: the reference leaves their cells untouched
    (``prev = row`` keeps raw whitespace) while this operator always
    trims; pre-clean first, as every shipped pipeline here does
    (``country_pipelines.kyrgyzstan_pipeline``).
    """
    value_cols = [c for c in df.columns if c not in (idx_col, partition_col)]

    kept = df.filter(~F.trim(qcol(key_col).cast("string")).startswith("Name:"))

    part = [partition_col] if partition_col else []
    w = W.partitionBy(*part).orderBy(qcol(idx_col).asc()) if part else W.orderBy(
        qcol(idx_col).asc()
    )
    flagged = kept.withColumn(
        "__gid",
        F.sum(is_new_record_col(qcol(key_col)).cast("int")).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )

    def merged(col: str):
        # Ordered, empty-skipping concat: collect (idx, value) pairs,
        # sort by idx, keep non-empty trimmed values, join with " ".
        pairs = F.array_sort(
            F.collect_list(F.struct(qcol(idx_col).alias("i"), F.trim(qcol(col)).alias("v")))
        )
        vals = F.filter(F.transform(pairs, lambda p: p["v"]), lambda v: v != "")
        return F.array_join(vals, " ").alias(col)

    grouped = flagged.groupBy(*part, "__gid").agg(
        F.min(idx_col).alias(idx_col), *[merged(c) for c in value_cols]
    )
    return grouped.drop("__gid").orderBy(*part, idx_col)
