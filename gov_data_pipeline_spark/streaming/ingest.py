"""Streaming corpus ingestion: the production shape of incremental
exact dedup (SURVEY L5's incremental form run continuously).

The reference ingests weekly batches sequentially; at 100 TB the same
pipeline runs as a stream of document batches where each micro-batch
must dedup against EVERYTHING already ingested without re-reading it
as documents. ``incremental_dedup_sink`` is that loop as a
``foreachBatch`` writer:

- the persisted corpus is consulted through
  ``operators.dedup.incremental_exact_dedup``, which reduces the seen
  side to distinct content hashes map-side before the anti-join — the
  increment shuffles digests, never historical documents;
- only fresh rows append to the corpus path, so the corpus directory
  is also the state: restarts resume from the checkpoint and the
  already-appended files, no separate state store to rebuild. (In a
  long-lived deployment the hash index would be persisted bucketed by
  hash next to the data; deriving it per batch keeps this operator a
  pure function of the directory, which is what the tests pin.)

``foreachBatch`` gives exactly-once appends per micro-batch under the
checkpoint; a batch retry re-runs the anti-join against the corpus as
already appended, so replayed duplicates still drop — the dedup itself
is the idempotence mechanism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def incremental_dedup_sink(
    stream_df: DataFrame,
    corpus_path: str,
    content_cols: list[str],
    id_col: str,
    checkpoint_dir: str,
) -> DataStreamWriter:
    """Build the ``writeStream`` for streaming dedup ingestion.

    Caller starts it (``.trigger(...).start()``); each micro-batch is
    deduped against the persisted corpus at ``corpus_path`` plus
    itself, and only fresh rows are appended.
    """
    from pyspark.errors import AnalysisException

    from gov_data_pipeline_spark.operators.dedup import incremental_exact_dedup

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            seen = spark.read.parquet(corpus_path)
            have_corpus = True
        except AnalysisException as e:
            # ONLY a missing corpus directory means "first batch". Any
            # other failure (corrupt footer, listing race, store hiccup)
            # must fail the batch so the checkpoint retries it — treating
            # it as first-batch would skip the anti-join and permanently
            # append duplicates.
            cond = ""
            get_cond = getattr(e, "getCondition", None) or getattr(
                e, "getErrorClass", None
            )
            if get_cond is not None:
                cond = get_cond() or ""
            if "PATH_NOT_FOUND" not in cond and "PATH_NOT_FOUND" not in str(e):
                raise
            have_corpus = False
        if have_corpus:
            fresh = incremental_exact_dedup(batch_df, seen, content_cols, id_col)
        else:
            from gov_data_pipeline_spark.operators.dedup import exact_dedup

            fresh = exact_dedup(batch_df, content_cols, id_col)
        fresh.write.mode("append").parquet(corpus_path)

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
