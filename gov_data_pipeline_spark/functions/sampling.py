"""Deterministic hash-bucket sampling primitives.

Membership is a pure function of a stable id — reproducible across
runs, clusters, and engines (md5 on both sides of the differential
oracle). The single definition every sampling query (q65, q69, q75)
and example shares; the DuckDB twin is
``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 2))::INT``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def hash_bucket_col(id_col: Column) -> Column:
    """Uniform bucket 0..255 from the first md5 byte of the id."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 2), 16, 10
    ).cast("int")


def stratified_exact_k(
    df: DataFrame, id_col: str, group_col: str, k: int
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per ``group_col``, chosen by
    the stable md5 rank of ``id_col`` (ties broken by the id itself) —
    the reproducible eval-set constructor. Where ``hash_bucket_col``
    keeps a FRACTION (count drifts with stratum size) and
    ``budget_sample`` fills a SIZE quota, this pins an exact COUNT:
    "exactly 100 held-out docs per language, identical on every
    re-ingest, cluster, and engine". Membership is a pure function of
    the ids present, so it carries a full differential oracle.

    Returns the kept rows plus ``sample_rank`` (1-based within the
    stratum). Scale shape: ONE hash-partition-by-group window — each
    stratum shuffles once and sorts within its partitions; there is no
    per-group collect and no driver loop. Skewed strata sort more
    data, but the window sort spills rather than OOMs; for k ≪ |group|
    at extreme skew, pre-filter with ``hash_bucket_col`` to a safe
    superset first (bucket < ceil(256·k·safety/|group|) still contains
    ≥ k survivors w.h.p.) and rank only the survivors.
    """
    _guard_sample_rank(df, "stratified_exact_k")
    return _md5_ranked(df, id_col, group_col).filter(
        F.col("sample_rank") <= k
    )


def stratified_exact_quota(
    df: DataFrame,
    id_col: str,
    group_col: str,
    quotas: DataFrame,
    quota_col: str,
) -> DataFrame:
    """``stratified_exact_k`` with a PER-GROUP k delivered by a quota
    table (``group_col``, ``quota_col``) instead of one literal — the
    mixture-materialization shape (q174 designs the quotas, this
    selects exactly min(quota, |group|) members per group). Membership
    is the SAME stable-md5-rank contract as ``stratified_exact_k``
    (one definition, shared rank helper — the two cannot drift), so
    the selected ids are a pure function of the ids present and the
    quota numbers. The quota table is group-sized and broadcast; the
    rank is still ONE hash-partition-by-group window."""
    _guard_sample_rank(df, "stratified_exact_quota")
    return (
        _md5_ranked(df, id_col, group_col)
        .join(F.broadcast(quotas), group_col)
        .filter(F.col("sample_rank") <= F.col(quota_col))
    )


def _guard_sample_rank(df: DataFrame, op: str) -> None:
    clash = {c for c in df.columns if c.lower() == "sample_rank"}
    if clash:
        raise ValueError(
            f"{op}: input already has column(s) "
            f"{sorted(clash)}; rename them first — 'sample_rank' is the "
            "operator's output rank"
        )


def _md5_ranked(df: DataFrame, id_col: str, group_col: str) -> DataFrame:
    """The shared membership rule: stable md5 rank of the id, ties by
    the id itself, 1-based within the group."""
    w = W.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return df.withColumn("sample_rank", F.row_number().over(w))


def budget_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    size_col: str,
    budget_num: int,
    budget_den: int,
) -> DataFrame:
    """Per-group budgeted prefix sample: within each ``group_col``,
    rank rows by the stable md5 hash of ``id_col`` (an unbiased,
    re-ingest-deterministic shuffle) and keep the maximal prefix whose
    cumulative ``size_col`` stays within ``budget_num/budget_den`` of
    the group's total — the mixture-assembly step that fills each
    source's token/char quota (q139). The fraction is applied as exact
    integer cross-multiplication (``cum·den ≤ total·num``), so no
    float boundary can disagree across engines or retries.

    Returns the kept rows plus a ``cum`` running-total column. Scale
    shape: group totals are a tiny aggregate broadcast back over the
    scan; the prefix sum is ONE hash-partition-by-group window, whose
    partitioning a following per-group rollup can reuse.
    """
    # ``cum`` is part of the output contract and ``__tot`` is an
    # internal scratch column; withColumn would silently REPLACE a
    # same-named input column, corrupting the caller's data instead of
    # failing. Refuse loudly (ADVICE r06). With the default
    # spark.sql.caseSensitive=false, withColumn("cum", ...) also
    # replaces an input named "CUM"/"Cum", so compare case-folded
    # (ADVICE r07).
    clash = {c for c in df.columns if c.lower() in {"cum", "__tot"}}
    if clash:
        raise ValueError(
            f"budget_sample: input already has column(s) {sorted(clash)}; "
            "rename them first — 'cum' is the operator's output running "
            "total and '__tot' its internal scratch name"
        )
    tot = df.groupBy(group_col).agg(F.sum(size_col).alias("__tot"))
    w = (
        W.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.withColumn("cum", F.sum(size_col).over(w))
        .join(F.broadcast(tot), group_col)
        .filter(F.col("cum") * budget_den <= F.col("__tot") * budget_num)
        .drop("__tot")
    )
