"""Streaming data-quality monitoring: per-micro-batch PSI drift
against a frozen reference profile — the continuous form of q114
(`queries/stats_ml.py`), sharing its formula term-for-term
(reference-decile bucketing, 1e-6 ln floor).

At 100 TB this is the gate that catches an upstream schema break or
distribution shift WHILE a training-data ingest is running instead of
after the corpus is poisoned: the reference profile is computed once
from a blessed snapshot (a per-type table of 9 decile edges + 10
bucket proportions — kilobytes), broadcast into every micro-batch, and
each batch reduces to one (event_type, psi) row. Nothing about the
monitor grows with corpus size; state is the checkpoint plus one tiny
output row per batch per type.

Idempotence: each batch overwrites its own ``batch_id=N`` partition
directory, so a checkpoint-replayed batch rewrites the identical rows
instead of appending duplicates — the partition IS the exactly-once
mechanism (same design argument as `ingest.py`'s dedup-as-idempotence,
with overwrite standing in for dedup because the output is keyed by
batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import DataStreamWriter

from gov_data_pipeline_spark.functions.drift import (
    N_BUCKETS as _N_BUCKETS,
    bucket_by_edges as _bucket,
    psi_term as _psi_term,
)


def reference_profile(events: DataFrame) -> DataFrame:
    """Freeze a reference profile from a blessed batch of events.

    Returns one row per event_type:
    ``(event_type, edges: array<double>[9], props: array<double>[10])``
    where ``props[b]`` is the empirical share of reference values in
    bucket ``b`` (exactly 0.1 each when values are distinct; computed
    empirically so heavy ties still profile correctly).
    """
    edges = events.groupBy("event_type").agg(
        F.expr(
            "percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,"
            "0.6D,0.7D,0.8D,0.9D))"
        ).alias("edges")
    )
    counts = (
        events.join(F.broadcast(edges), "event_type")
        .select("event_type", _bucket("edges").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    props = (
        counts.groupBy("event_type")
        .agg(
            F.sum("n").alias("tot"),
            F.map_from_entries(F.collect_list(F.struct("bucket", "n"))).alias(
                "m"
            ),
        )
        .select(
            "event_type",
            F.transform(
                F.sequence(F.lit(0), F.lit(_N_BUCKETS - 1)),
                lambda b: F.coalesce(F.element_at("m", b), F.lit(0)).cast(
                    "double"
                )
                / F.col("tot"),
            ).alias("props"),
        )
    )
    return edges.join(props, "event_type")


def _psi(m: Column, tot_cur: Column, props: Column) -> Column:
    """PSI of the batch's bucket-count map vs reference proportions —
    q114's formula via the shared :func:`psi_term` (one definition for
    batch and stream)."""

    def term(acc: Column, b: Column) -> Column:
        p_cur = (
            F.coalesce(F.element_at(m, b), F.lit(0)).cast("double") / tot_cur
        )
        p_ref = F.element_at(props, b + 1)  # element_at is 1-based
        return acc + _psi_term(p_cur, p_ref)

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(_N_BUCKETS - 1)), F.lit(0.0), term
    )


def psi_drift_sink(
    stream_df: DataFrame,
    profile: DataFrame,
    out_path: str,
    checkpoint_dir: str,
) -> DataStreamWriter:
    """foreachBatch monitor: score each micro-batch's PSI per event
    type against ``profile`` (from :func:`reference_profile`) and
    write ``(event_type, n_events, psi, batch_id)`` rows under
    ``out_path/batch_id=N``.

    Event types absent from the profile are dropped (no reference — no
    score), exactly as q114's inner join does; an empty batch writes an
    empty partition. Reading ``out_path`` as parquet yields the full
    monitor history with ``batch_id`` as a partition column.

    The profile is MATERIALIZED here, once: collecting the (types ×
    19 doubles) rows freezes the baseline so (a) every micro-batch
    scores against the same numbers even if the reference files are
    later overwritten, and (b) batches don't lazily re-execute the
    profile's two reference scans + percentile aggregate per trigger.
    """
    frozen = profile.collect()
    schema = profile.schema

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        prof = batch_df.sparkSession.createDataFrame(frozen, schema)
        counts = (
            batch_df.join(F.broadcast(prof), "event_type")
            .select("event_type", _bucket("edges").alias("bucket"))
            .groupBy("event_type", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        cur = counts.groupBy("event_type").agg(
            F.sum("n").alias("n_events"),
            F.map_from_entries(F.collect_list(F.struct("bucket", "n"))).alias(
                "m"
            ),
        )
        scored = cur.join(F.broadcast(prof), "event_type").select(
            "event_type",
            "n_events",
            F.round(_psi(F.col("m"), F.col("n_events"), F.col("props")), 4).alias(
                "psi"
            ),
        )
        scored.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
