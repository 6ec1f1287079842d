"""Relational operators Spark lacks as single built-ins.

Each is a composition of DataFrame operations chosen for scale: no
``collect()``, no row explosion beyond what the semantics require, and
shuffle patterns that hold at 1000 executors.

Reference ancestry (SURVEY.md §2.2): as-of join T13, row-index attach
T14 (generalizing the reference's image-column attach,
``handlers/base.py:256-272``), top-k per group T25, sessionize T23 (the
group-id trick behind the reference's continuation-row merge,
``handlers/kyrgyzstan.py:183-217``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_values: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: backward (default), forward, or nearest.

    For every left row, attach the right row with (``backward``) the
    greatest ``right_time`` <= ``left_time``, (``forward``) the
    smallest ``right_time`` >= ``left_time``, or (``nearest``) the
    smaller absolute time distance of the two — ties to the prior row,
    pandas.merge_asof's convention — within the same ``on`` key group.

    Implementation: union-tag + window ``last``/``first``
    (ignorenulls). Both sides are tagged and unioned, sorted by time
    within each key partition, and the right side's values carry
    forward (or backward) to the adjacent left rows. Every direction —
    including ``nearest``, which evaluates both window frames over the
    same partitioning — is ONE shuffle on the key (no range-join row
    explosion, no per-key skew beyond the data's own key skew), so it
    scales linearly — the pattern survives 100x data where a naive
    range join + row_number would blow up quadratically in hot keys.

    ``nearest`` compares time distances EXACTLY: int64 microseconds
    (``unix_micros``) for timestamp columns, native values otherwise —
    never floating point, where quantized payloads would flip exact
    ties. Use timestamp or numeric time columns with it.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    from pyspark.sql import types as T

    keys = [on] if isinstance(on, str) else list(on)
    if right_values is None:
        right_values = [c for c in right.columns if c not in keys and c != right_time]

    # The matched right row travels as ONE struct: carrying each value
    # column through its own last(ignorenulls) would fill a NULL field
    # of the latest right row from an EARLIER right row, fabricating a
    # row that never existed. The struct itself is non-null on every
    # right row, so last(ignorenulls) picks the latest right ROW
    # atomically — its fields, nulls included, arrive together.
    r_struct_type = T.StructType(
        [T.StructField("__time", right.schema[right_time].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in right_values]
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(right_time).alias("__time"),
            *[F.col(c) for c in right_values],
        ).alias("__r"),
    )
    unioned = l_tag.unionByName(r_tag)

    # Backward: right rows sort before left rows at equal timestamps so
    # a right row at exactly left_time matches (<=, inclusive as-of).
    # The right struct itself is the final order key: among
    # SAME-timestamp right rows the match would otherwise be whichever
    # the sort happened to place last — nondeterministic across
    # runs/plans; struct ordering (field-wise: time, then values) makes
    # it the deterministic maximum.
    w_back = (
        W.partitionBy(*keys)
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_left").asc(),
            F.col("__r").asc_nulls_first(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Forward mirror: left rows sort first at equal timestamps (so an
    # equal-time right row sits in the FOLLOWING frame — >= inclusive),
    # and first(ignorenulls) picks the deterministic struct minimum
    # among same-timestamp right rows.
    w_fwd = (
        W.partitionBy(*keys)
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_left").desc(),
            F.col("__r").asc_nulls_last(),
        )
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    back = F.last("__r", ignorenulls=True).over(w_back)
    fwd = F.first("__r", ignorenulls=True).over(w_fwd)
    if direction == "backward":
        matched = back
    elif direction == "forward":
        matched = fwd
    else:
        # nearest: both frames share the one key partitioning (Spark
        # plans one exchange + two in-partition sorts); ties — equal
        # distance — go to the PRIOR row (merge_asof convention). An
        # equal-time right row appears in BOTH frames (w_fwd sorts left
        # rows first at equal __t, so the right row is still in the
        # following frame); correctness rests on d_fwd == d_back == 0
        # resolving to the backward pick via the .otherwise(back) arm.
        # EXACT integer time distances: timestamps compare in int64
        # micros (unix_micros). Epoch-SECOND doubles would quantize a
        # microsecond payload and flip ~25% of exact-distance ties to
        # forward (caught by review simulation — the fixture has
        # non-zero micros on every row), silently violating both the
        # ties-to-prior contract and the q160 oracle's epoch_us math.
        from pyspark.sql import types as T2

        if isinstance(left.schema[left_time].dataType, (T2.TimestampType, T2.TimestampNTZType)):
            def _us(c: Column) -> Column:
                return F.unix_micros(c)
        else:  # numeric time axes compare natively
            def _us(c: Column) -> Column:
                return c
        d_back = _us(F.col("__t")) - _us(back["__time"])
        d_fwd = _us(fwd["__time"]) - _us(F.col("__t"))
        matched = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_fwd < d_back, fwd)
            .otherwise(back)
        )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__is_left"),
        matched["__time"].alias(f"{prefix}{right_time}"),
        *[matched[c].alias(f"{prefix}{c}") for c in right_values],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def attach_row_index(df: DataFrame, order_by: list[str], name: str = "row_idx") -> DataFrame:
    """Attach a 0-based dense row index under a total order.

    Generalizes the reference's positional column attach (SURVEY R18/R19)
    without ``monotonically_increasing_id`` (whose values are
    partition-dependent, not dense, and not stable across retries).

    Note: a single global ``row_number`` window funnels everything
    through one task. That is the *correct* price for a total order on
    unordered input; when the downstream only needs per-key positions,
    pass keys to ``Window.partitionBy`` instead (see ``sessionize``).
    For ingest-order indexing at scale, prefer ``zipWithIndex`` at read
    time before any shuffle.
    """
    w = W.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(name, F.row_number().over(w) - F.lit(1))


def attach_row_index_ingest(
    df: DataFrame,
    order_by: list[str] | None = None,
    name: str = "row_idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 0-based dense row index with the zipWithIndex PATTERN —
    per-partition positions plus broadcast partition offsets — but
    entirely JVM-side (``df.rdd.zipWithIndex`` would round-trip every
    row through Python pickling, which defeats the point of the scale
    path).

    With ``order_by``, the input is range-partitioned and sorted on
    those keys first, so the index is the global rank under that order
    — computed WITHOUT the single-task global-window funnel: the
    within-partition position comes from ``monotonically_increasing_id``
    (partition id in the high bits, a 0-based per-partition counter in
    the low 33 — dense *within* a partition, which is all we use it
    for; the offsets make the result globally dense), partition row
    counts are one lightweight aggregate job whose result (one row per
    partition — the same driver-side footprint as zipWithIndex's count
    job) becomes a broadcast offset join. Every partition stays busy at
    1000 executors and corpus-sized data crosses only the range
    exchange.

    The sorted relation is ``localCheckpoint``-pinned before the two
    jobs (counts, result) so both observe identical partitioning —
    re-executing a range exchange per job could legally re-sample
    boundaries. Without ``order_by``, the index is ingest order
    (partition order x within-partition order) — the right call
    directly after a file read, before any shuffle.
    """
    spark = df.sparkSession
    if order_by:
        n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
        df = df.repartitionByRange(n, *order_by).sortWithinPartitions(*order_by)
    mid = F.monotonically_increasing_id()
    with_mid = df.withColumn("__mid", mid).localCheckpoint(eager=False)
    shift = F.call_function("shiftright", F.col("__mid"), F.lit(33))
    pos = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    counts = (
        with_mid.groupBy(shift.alias("__pid"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], acc))
        acc += row["__n"]
    off_df = spark.createDataFrame(offsets, "__pid long, __off long")
    return (
        with_mid.withColumn("__pid", shift)
        .join(F.broadcast(off_df), "__pid")
        .withColumn(name, F.col("__off") + pos)
        .drop("__pid", "__mid", "__off")
    )


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per group via ``row_number`` (ties broken by order_by).

    One shuffle on the group key; each partition keeps only its top k
    after the window, so the output never materializes the full sort.
    Callers must include a unique tiebreak column in ``order_by`` for
    deterministic output.
    """
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign per-key session ids: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``.

    The sum-of-flags group-id construction (SURVEY T23) — the same
    window rewrite that replaces the reference's sequential
    continuation-row scan (``handlers/kyrgyzstan.py:183-217``). One
    shuffle on the key; sessions never cross keys so this parallelizes
    perfectly across keys.
    """
    w = W.partitionBy(key).orderBy(F.col(ts).asc())
    gap = F.col(ts).cast("double") - F.lag(F.col(ts).cast("double")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: value-identical to ``big.join(small, on,
    how)`` but immune to hot keys.

    The big side scatters each row into one of ``salt`` buckets (a
    deterministic hash of ``salt_on`` — no RNG state, so retries and
    speculative tasks agree); the small side replicates every row into
    all ``salt`` buckets. Joining on ``on + [salt]`` splits a hot key's
    rows across ``salt`` reducers instead of one straggler task.

    ``salt_on`` defaults to all big-side columns; pass a UNIQUE column
    (a row id) when hot keys can repeat with identical payloads —
    identical rows hash identically, so a whole-row salt would send
    all copies of a duplicated hot row to one bucket. (A random salt
    would scatter those too, but breaks retry/speculation determinism;
    a unique id gives both.)

    Use when a specific join is known-skewed and AQE's skew-join
    (which splits oversized partitions at runtime) isn't available —
    e.g. under a required sort-merge bucketing layout, or for the
    build side of a shuffled hash join. Cost: the small side shuffles
    ``salt``x its size, so keep it the dimension side.

    Supported ``how``: inner / left (semantics preserved because every
    big-side row lands in exactly one bucket and every small-side key
    exists in all buckets).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_cols = salt_on if salt_on is not None else list(big.columns)
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt)).cast(
        "int"
    )
    b = big.withColumn("__salt", bucket)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return b.join(s, on + ["__salt"], how).drop("__salt")


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Latest-wins upsert (MERGE INTO / SCD-type-1 semantics as a pure
    batch operator): union base and updates, keep the row with the
    highest ``order_col`` per key (ties go to the update side when the
    caller encodes it in ``order_col``, e.g. a version or load
    timestamp).

    One shuffle on the key. At warehouse scale the same plan runs
    incrementally: ``base`` is the bucketed/partitioned table, and only
    the partitions containing updated keys need rewriting (partition
    pruning via a semi-join of affected partition values).
    """
    allr = base.unionByName(updates)
    w = W.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        allr.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_history(
    changelog: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """SCD-type-2: collapse a change log into validity intervals.

    ``changelog`` holds one row per observation of an entity's
    attributes at ``ts_col``. Consecutive observations with identical
    ``attr_cols`` merge into one interval; each attribute change opens
    a new one. Output = input columns (keys + attrs) plus
    ``effective_from`` / ``effective_to`` (null = still current) and
    ``is_current``.

    Two windows, both partitioned by the entity key — the only shuffle
    is one hash-partition on the key, and every window is a per-key
    sort, never global. ``tiebreak_cols`` orders same-timestamp
    observations deterministically (pass the source's unique id);
    without it, equal-timestamp duplicates would make change detection
    nondeterministic under shuffle.
    """
    tb = [F.col(c) for c in (tiebreak_cols or [])]
    w = W.partitionBy(*key_cols).orderBy(F.col(ts_col), *tb)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(c).over(w)
        # null-safe inequality: a NULL attribute is a real state, and
        # NULL <=> NULL must compare as "no change"
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first = F.lag(ts_col).over(w).isNull()
    versions = changelog.withColumn("__new", first | changed).filter("__new")
    w2 = W.partitionBy(*key_cols).orderBy(F.col(ts_col), *tb)
    return (
        versions.select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("effective_from"),
            F.lead(ts_col).over(w2).alias("effective_to"),
        )
        .withColumn("is_current", F.col("effective_to").isNull())
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_days: int = 30,
    num_partitions: int | None = None,
) -> DataFrame:
    """Interval-overlap join: all (left, right) pairs sharing the
    ``on`` keys whose closed date intervals ``[start, end]`` overlap
    (``l.start <= r.end AND r.start <= l.end``).

    Spark has no range-join optimization, so the naive formulation is
    an equi-join on the keys followed by a quadratic per-key filter —
    every pair of rows in a hot key group gets compared, which is the
    classic scale killer for long-history keys. This operator uses the
    standard BINNING decomposition instead: each interval explodes
    into the ``bin_days``-wide bins it touches, candidates come from
    an equi-join on ``(keys..., bin)``, and a pair is accepted exactly
    once — in the bin of ``greatest(l.start, r.start)``, a bin both
    intervals provably cover whenever they overlap. Per-key-per-bin
    group sizes replace per-key group sizes in the quadratic term, so
    cost scales with temporal DENSITY (rows whose intervals genuinely
    coexist), not history length. Row explosion is bounded by
    ``interval_len / bin_days + 1`` per row — pick ``bin_days`` near
    the typical interval length (explosion <= 2x) for the best
    candidate-to-match ratio.

    ``start``/``end`` must be date or timestamp columns with
    ``end >= start`` per row (an inverted interval would explode into a
    DESCENDING bin sequence and silently match nothing it should);
    binning is on the DATE day number, overlap on the raw values. Both
    inputs' other column names must be disjoint (keys excepted) —
    standard join hygiene.

    ``num_partitions`` pins the candidate join's parallelism. Bin
    joins EXPAND — output rows ≈ sum of per-(key, bin) products — but
    AQE sizes post-shuffle partitions by INPUT bytes, so a
    small-input/large-output join can get coalesced onto a handful of
    cores and run CPU-bound single-file (measured on the sf0.1
    fixture: 4.6 s coalesced-to-3 vs 1.8 s pinned-to-32). Set it to
    the cluster's core count when the expansion factor is high; leave
    None to let AQE decide (right when the exchange bytes, not the
    pair CPU, dominate).
    """
    keys = [on] if isinstance(on, str) else list(on)

    def _day(col: str) -> Column:
        return F.datediff(F.to_date(F.col(col)), F.lit("1970-01-01"))

    def _binned(df: DataFrame, start: str, end: str) -> DataFrame:
        lo = F.floor(_day(start) / bin_days)
        hi = F.floor(_day(end) / bin_days)
        out = df.withColumn("__bin", F.explode(F.sequence(lo, hi)))
        if num_partitions is not None:
            # explicit co-partitioning on the join key: the join reuses
            # it (no extra exchange) and AQE honours the pinned count
            out = out.repartition(num_partitions, *keys, "__bin")
        return out

    cand = _binned(left, left_start, left_end).join(
        _binned(right, right_start, right_end), [*keys, "__bin"]
    )
    max_start = F.greatest(F.col(left_start), F.col(right_start))
    anchor_bin = F.floor(
        F.datediff(F.to_date(max_start), F.lit("1970-01-01")) / bin_days
    )
    return (
        cand.where(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("__bin") == anchor_bin)
        )
        .drop("__bin")
    )
