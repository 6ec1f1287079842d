"""Custom stateful streaming operator (SURVEY L9/L10 extension):
per-key cumulative-threshold alerting via ``applyInPandasWithState``.

This is the pattern for operators Spark's built-in windowed
aggregations cannot express: arbitrary per-key running state updated in
event order. The reference's closest ancestor is the sequential
continuation-row scan (``handlers/kyrgyzstan.py:183-217``) — state
carried across rows — but here the state lives in Spark's streaming
state store, checkpointed and partitioned by key, instead of a Python
loop over the whole table.

Semantics (both modes identical): for each user, accumulate ``value``
in ``(ts, event_id)`` order; emit one row per event that pushes the
running total across a multiple of ``threshold`` ("alert"), with the
truncated running total and the level index reached.

- **Batch mode** expresses it as a window cumulative sum — fully
  SQL-expressible, so this form carries the DuckDB oracle (q66).
- **Streaming mode** keeps one long (integer cents) per user in
  ``GroupState`` — O(distinct keys) state, never O(rows).

All three executions (stream, batch twin, DuckDB oracle) use exact
arithmetic — integer cents / DECIMAL(18,2) — because float cumsums are
summation-order-dependent (DuckDB windows aggregate via segment tree,
Spark sequentially) and disagree by ulps right at the floor boundary.

Scale notes: state is one 8-byte double per key, partitioned by the
shuffle on ``user_id`` — 10^9 users is 8 GB of state across the
cluster, far below the state-store practical limits. Alerts stream out
incrementally (append mode); nothing buffers unbounded. Event-time
order across micro-batches is the caller's contract (upstream
watermark + sorted replay); within a micro-batch the operator sorts.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.window import Window as W

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("cum_value", T.DoubleType()),
        T.StructField("level", T.IntegerType()),
    ]
)

# State: running total in integer cents — exact arithmetic, so the
# stream, the batch twin (decimal sums) and the DuckDB oracle agree
# bit-for-bit. Float accumulation would not: engines disagree by ulps
# when summation order differs (DuckDB windows sum via segment tree).
_STATE_SCHEMA = T.StructType([T.StructField("cum_cents", T.LongType())])


def _to_cents(v: float | None) -> int:
    """Match the batch twin's DECIMAL(18,2) cast (HALF_UP), not Python
    ``round()``'s half-to-even: 0.125 -> 13 cents in both paths. A
    NULL/NaN value contributes 0 — matching the batch twins, whose
    ``F.sum`` skips nulls and (for capped sessions) coalesces the
    all-NULL-session sum to 0 so the edge agrees too (review finding:
    Decimal('nan') raises InvalidOperation and would kill the
    streaming query where the batch twin quietly carries on)."""
    from decimal import ROUND_HALF_UP, Decimal

    if v is None or v != v:  # None or NaN
        return 0
    return int(Decimal(str(v)).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100)


def _batch_cumulative_alerts(events: DataFrame, threshold: float) -> DataFrame:
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Integer-cents arithmetic END TO END, exactly like the streaming
    # state loop: dividing the DECIMAL cumsum by the raw float
    # threshold would disagree with the cents path at floor boundaries
    # whenever the threshold is not binary-representable (e.g.
    # threshold=0.1, cum=0.30: cents give level 3, float floor(
    # 0.3/0.1)=floor(2.999...)=2).
    thr_cents = int(round(threshold * 100))
    vc = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    cc = F.sum(vc).over(w)
    scored = events.select(
        "user_id",
        "event_id",
        "ts",
        vc.alias("__vc"),
        cc.alias("__cc"),
    )

    def lvl(c):
        # floor division in exact long arithmetic: (c - pmod(c, t)) is
        # divisible by t, so `div` (truncating) equals floor division
        # for negatives too — matching Python's `//` in the state loop
        return ((c - F.pmod(c, F.lit(thr_cents))) / F.lit(thr_cents)).cast("long")

    crossed = lvl(F.col("__cc")) > lvl(F.col("__cc") - F.col("__vc"))
    return scored.filter(crossed).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("__cc") / F.lit(100.0)).alias("cum_value"),
        lvl(F.col("__cc")).cast("int").alias("level"),
    )


def cumulative_alerts(events: DataFrame, threshold: float = 1000.0) -> DataFrame:
    """Emit an alert row whenever a user's running ``value`` total
    crosses a multiple of ``threshold``.

    Streaming input -> ``applyInPandasWithState`` (state: one double per
    user). Batch input -> the window-cumsum twin with identical
    semantics (the oracle-checked form, q66).
    """
    if not events.isStreaming:
        return _batch_cumulative_alerts(events, threshold)

    import pandas as pd  # local: executors import lazily

    thr_cents = int(round(threshold * 100))

    def update(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: Any
    ) -> Iterator["pd.DataFrame"]:
        cum = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        out: list[tuple[Any, ...]] = []
        for row in batch.itertuples(index=False):
            prev = cum
            cum = cum + _to_cents(float(row.value))
            if cum // thr_cents > prev // thr_cents:
                out.append(
                    (
                        key[0],
                        int(row.event_id),
                        row.ts,
                        cum / 100.0,
                        int(cum // thr_cents),
                    )
                )
        state.update((cum,))
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "ts", "cum_value", "level"]
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


THROTTLE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_THROTTLE_STATE = T.StructType([T.StructField("last_us", T.LongType())])


def throttle_dedup(events: DataFrame, gap_seconds: int = 86400) -> DataFrame:
    """Per-(user, type) time-gap dedup run CONTINUOUSLY — the streaming
    form of q148's event throttle (alert suppression, telemetry
    coalescing): an event is emitted iff no event with the same key
    occurred within the previous ``gap_seconds``; the suppression
    anchor is always the PREVIOUS event, emitted or not (chain/burst
    semantics — a slow drip spaced just under the gap stays one burst).

    - **Batch mode**: the q148 lag-window plan filtered to burst heads
      — SQL-expressible, so this form carries the DuckDB oracle (q150).
    - **Streaming mode**: one long (last event micros) per key in
      ``GroupState`` via ``applyInPandasWithState`` — O(distinct keys)
      state, updated by EVERY event so suppressed events still advance
      the anchor. Same cross-micro-batch ordering contract as
      ``cumulative_alerts`` (sorted replay; within-batch the operator
      sorts). All arithmetic is integer microseconds on both engines.

    NULL ``ts`` boundary: both modes always EMIT a NULL-ts event (a
    row with no event time cannot be proven a duplicate), but the
    modes diverge on the event AFTER it — batch's lag-window sees a
    NULL anchor (gap NULL -> emitted) while the stream retains the
    last real timestamp. NULL event time is out-of-contract for any
    watermarked stream anyway (it would stall the watermark), so the
    stream documents rather than reconciles this; filter or repair ts
    upstream when feeding this operator.
    """
    gap_us = int(gap_seconds) * 1_000_000
    cols = ("user_id", "event_type", "event_id", "ts")
    if not events.isStreaming:
        w = W.partitionBy("user_id", "event_type").orderBy(
            F.col("ts").asc_nulls_first(), "event_id"
        )
        gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
        return (
            events.select(*cols)
            .withColumn("__g", gap)
            .filter(F.col("__g").isNull() | (F.col("__g") > gap_us))
            .drop("__g")
        )

    import pandas as pd  # local: executors import lazily

    def update(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: Any
    ) -> Iterator["pd.DataFrame"]:
        last = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        # na_position mirrors the batch twin's NULLS FIRST ordering
        batch = batch.sort_values(["ts", "event_id"], na_position="first")
        out: list[tuple[Any, ...]] = []
        for row in batch.itertuples(index=False):
            us = None if pd.isna(row.ts) else int(pd.Timestamp(row.ts).value // 1_000)
            if us is None or last is None or us - last > gap_us:
                out.append((key[0], key[1], int(row.event_id), row.ts))
            if us is not None:
                last = us
        if last is not None:
            state.update((last,))
        yield pd.DataFrame(
            out, columns=["user_id", "event_type", "event_id", "ts"]
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.select(*cols).groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType=THROTTLE_SCHEMA,
        stateStructType=_THROTTLE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CAPPED_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
    ]
)

_CAPPED_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def capped_session_stats(
    events: DataFrame,
    gap_seconds: int = 43200,
    max_events: int = 4,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-user session summaries where a session closes on EITHER rule:
    an inactivity gap > ``gap_seconds`` (the q62/q13 rule), or reaching
    ``max_events`` rows (batching/quota semantics — "flush every N
    interactions"). Emits (user, start, end=last event ts, n, exact
    integer-cents value sum) per closed session.

    Why this operator exists when ``F.session_window`` already does
    streaming sessions: the count cap is STATE-DEPENDENT — whether an
    event opens a new session depends on how many rows the current one
    has absorbed — which no built-in window (session, sliding, or
    tumbling) can express. And unlike ``cumulative_alerts`` /
    ``throttle_dedup`` above (NoTimeout), it needs a TIMER: a session
    whose user simply goes silent must flush when the event-time
    watermark passes last_ts + gap — the lag-window trick cannot emit
    a row no later event triggers.

    - **Batch mode**: two windows — the cumulative-flag gap session id
      (q13's trick), then ``(row_number - 1) div max_events`` inside it
      — fully SQL-expressible, so this form carries the DuckDB oracle
      (q157).
    - **Streaming mode**: ``applyInPandasWithState`` with
      ``GroupStateTimeout.EventTimeTimeout`` — one 4-long tuple per
      user of state (start_us, last_us, n, cents), O(distinct keys);
      sessions stream out on the closing event (count cap / gap
      break) or on the timeout invocation (silence). Each batch
      re-arms ``setTimeoutTimestamp(last_us + gap)``, which OVERWRITES
      the key's previous deadline — no stale-timer bookkeeping.
      Spark 4's ``transformWithStateInPandas`` expresses this same
      operator with named timers + typed state and is the migration
      target, but its state protocol requires the ``protobuf`` package
      (absent in this runtime — probed: the twS Python driver worker
      dies importing ``StateMessage_pb2``), so the shipped and TESTED
      implementation is the timeout form, which is protocol-free.

    Cross-micro-batch ordering contract and integer-cents arithmetic
    as in ``cumulative_alerts``. NULL event time is out-of-contract,
    as for ``throttle_dedup``: it would stall any watermark, and batch
    engines disagree on NULL ordering (Spark sorts NULLS FIRST ASC,
    DuckDB NULLS LAST) — filter or repair ts upstream. A trailing open
    session emits only once the watermark passes its deadline — replay
    harnesses append a sentinel event beyond max(ts) + gap to flush
    (see tests/test_streaming.py); in production the next day's data
    is that sentinel.
    """
    gap_us = int(gap_seconds) * 1_000_000
    cols = ("user_id", "event_id", "ts", "value")
    if not events.isStreaming:
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
        flagged = events.select(*cols).withColumn(
            "__new", (gap.isNull() | (gap > gap_us)).cast("long")
        )
        gid = F.sum("__new").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        sessions = flagged.withColumn("__gid", gid)
        w2 = W.partitionBy("user_id", "__gid").orderBy("ts", "event_id")
        sub = sessions.withColumn(
            "__sid", F.floor((F.row_number().over(w2) - 1) / max_events)
        )
        vc = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
        return (
            sub.groupBy("user_id", "__gid", "__sid")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                # coalesce: a session whose EVERY value is NULL must sum
                # to 0 cents, matching the streaming loop (NULL/NaN ->
                # 0 per event) — F.sum alone returns NULL for that edge
                F.coalesce(F.sum(vc), F.lit(0).cast("long")).alias(
                    "sum_cents"
                ),
            )
            .select(
                "user_id", "session_start", "session_end",
                "n_events", "sum_cents",
            )
        )

    import pandas as pd  # local: executors import lazily

    cap = int(max_events)

    def _row(key: tuple[Any, ...], st: tuple) -> tuple:
        return (
            key[0],
            pd.Timestamp(st[0], unit="us"),
            pd.Timestamp(st[1], unit="us"),
            st[2],
            st[3],
        )

    def update(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: Any
    ) -> Iterator["pd.DataFrame"]:
        out: list[tuple] = []
        if state.hasTimedOut:
            # watermark passed last_us + gap with no new events: the
            # open session can never grow — flush it
            st = tuple(state.get) if state.exists else None
            if st is not None:
                out.append(_row(key, st))
                state.remove()  # also clears the armed timeout
        else:
            batch = pd.concat(list(pdfs), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])
            st = tuple(state.get) if state.exists else None
            for row in batch.itertuples(index=False):
                us = int(pd.Timestamp(row.ts).value // 1_000)
                cents = _to_cents(float(row.value))
                if st is None:
                    st = (us, us, 1, cents)
                elif us - st[1] > gap_us:
                    out.append(_row(key, st))
                    st = (us, us, 1, cents)
                else:
                    st = (st[0], us, st[2] + 1, st[3] + cents)
                if st[2] >= cap:
                    # complete by definition: any later event starts a
                    # new session whether it beats the gap or not
                    out.append(_row(key, st))
                    st = None
            if st is not None:
                state.update(st)
                # overwrites any previous deadline for this key
                state.setTimeoutTimestamp((st[1] + gap_us) // 1_000)
            elif state.exists:
                state.remove()
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_start", "session_end",
                "n_events", "sum_cents",
            ],
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select(*cols)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=CAPPED_SESSION_SCHEMA,
            stateStructType=_CAPPED_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


TOKEN_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("tokens_after", T.LongType()),
    ]
)

_BUCKET_STATE = T.StructType(
    [
        T.StructField("tokens", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)

def token_bucket_throttle(
    events: DataFrame,
    rate_tokens: int = 1,
    per_seconds: int = 86400,
    burst: int = 2,
) -> DataFrame:
    """Per-user token-bucket rate limiter — the quota-shaped sibling of
    ``throttle_dedup``'s gap rule: each user owns a bucket of
    ``burst`` tokens refilling at ``rate_tokens`` per ``per_seconds``
    seconds; an event is kept
    iff a whole token is available (and consumes it), dropped
    otherwise. Dropped events do NOT advance any anchor — unlike the
    gap throttle, a sustained flood still lets ``rate_per_hour``
    events through (gap throttles starve under floods; token buckets
    guarantee the average rate). Emits kept events with the remaining
    balance.

    Arithmetic is integer-exact end to end in BOTH modes and in the
    DuckDB oracle: one token is ``per_seconds * 1e6`` balance units,
    so the refill is ``dt_us * rate_tokens`` — one integer multiply,
    no division for engines to round differently.

    - **Batch mode**: the recurrence is non-associative (each verdict
      depends on the full prior history), so — exactly like the NFD
      packer — ONE ``applyInPandas`` per user over (user, event, ts)
      rows only; payload columns never enter Python. Oracle (q161) =
      per-key linear recursive CTE.
    - **Streaming mode**: ``applyInPandasWithState`` holding
      (tokens, last_us) per user — O(distinct keys) state, NoTimeout
      (a bucket needs no timer: balance is reconstructed from dt at
      the next event).

    NULL event times are dropped up front in both modes (a quota
    decision needs a clock; also the q150 NULL-ordering divergence).
    Cross-micro-batch ordering contract as in ``cumulative_alerts``.
    """
    rate = int(rate_tokens)
    token_unit = int(per_seconds) * 1_000_000
    burst_units = int(burst) * token_unit
    cols = ("user_id", "event_id", "ts")

    import pandas as pd  # local: executors import lazily

    def _drain(
        pdf: "pd.DataFrame", tokens: int, last_us: int | None
    ) -> tuple["pd.DataFrame", int, int | None]:
        # timestamp->micros VECTORIZED before the sequential pass: a
        # per-row pd.Timestamp() costs more than the whole state loop
        # (measured ~2x the operator's end-to-end time at sf0.1); the
        # loop itself then touches only plain ints.
        pdf = pdf.sort_values(["ts", "event_id"])
        # normalize whatever datetime64 resolution Arrow delivered
        us_arr = pdf.ts.values.astype("datetime64[us]").astype("int64").tolist()
        keep = [False] * len(us_arr)
        balance = [0] * len(us_arr)
        for i, us in enumerate(us_arr):
            if last_us is not None:
                tokens = min(tokens + (us - last_us) * rate, burst_units)
            if tokens >= token_unit:
                tokens -= token_unit
                keep[i] = True
                balance[i] = tokens
            last_us = us
        out = pdf.loc[keep, ["user_id", "event_id", "ts"]].copy()
        out["tokens_after"] = [b for k, b in zip(keep, balance) if k]
        return out, tokens, last_us

    out_cols = ["user_id", "event_id", "ts", "tokens_after"]

    if not events.isStreaming:
        src = events.select(*cols).where(F.col("ts").isNotNull())

        def run_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
            out, _, _ = _drain(pdf, burst_units, None)
            return out

        return src.groupBy("user_id").applyInPandas(
            run_group, schema=TOKEN_BUCKET_SCHEMA
        )

    def update(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: Any
    ) -> Iterator["pd.DataFrame"]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch.ts.notna()]
        tokens, last_us = (
            tuple(state.get) if state.exists else (burst_units, None)
        )
        out, tokens, last_us = _drain(batch, tokens, last_us)
        if last_us is not None:
            state.update((tokens, last_us))
        yield out if len(out) else pd.DataFrame(
            {c: [] for c in out_cols}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select(*cols)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=TOKEN_BUCKET_SCHEMA,
            stateStructType=_BUCKET_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
