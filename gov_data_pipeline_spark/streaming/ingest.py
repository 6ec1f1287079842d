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

from pyspark.sql import DataFrame, functions as F
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


def incremental_neardup_sink(
    stream_df: DataFrame,
    corpus_path: str,
    text_col: str,
    id_col: str,
    checkpoint_dir: str,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    rows_per_band: int = 4,
    threshold: float = 0.8,
) -> DataStreamWriter:
    """Streaming NEAR-dup ingestion: ``incremental_dedup_sink``'s
    MinHash-LSH sibling (SURVEY L6 run continuously). Each micro-batch
    drops documents whose exact shingle-Jaccard against the persisted
    corpus — or against a lower-id document in the same batch — meets
    ``threshold``; only novel documents append.

    Scale shape per batch: both sides reduce to (id, band, bucket)
    rows (bands per doc, never document bytes) before the candidate
    equi-join; the verify stage joins candidate pairs back to the two
    shingle inverted indexes, so its cost is |candidates| x
    shingles-per-doc. The corpus side recomputes signatures from text
    each batch to stay a pure function of the directory (what the
    tests pin); a long-lived deployment persists the (id, band,
    bucket) index bucketed by (band, bucket) next to the data and this
    operator's plan loses its only corpus-sized scan.

    Retry idempotence: a replayed batch's rows are exact dups of their
    own first append (Jaccard 1.0 >= any threshold), so they drop in
    the batch-vs-corpus stage — same mechanism as the exact sink.
    Greedy transitivity: if batch doc B near-dups batch doc A and A
    itself drops against the corpus, B still drops — B is transitively
    near the corpus, the standard greedy-dedup contract.
    """
    from pyspark.errors import AnalysisException

    from gov_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        shingle_rows,
        signature_band_buckets,
        verify_candidates_jaccard,
    )

    def _sig(df: DataFrame) -> DataFrame:
        ex = shingle_rows(
            df, id_col, F.col(text_col), shingle_n, widen=False, distinct=False
        )
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
        return (
            ex.groupBy(id_col)
            .agg(*aggs)
            .select(
                F.col(id_col),
                F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias(
                    "sig"
                ),
            )
        )

    def _cross_verified(cands, ex_a, ex_b):
        """Exact Jaccard over candidate pairs with SEPARATE a/b shingle
        indexes (the two id spaces may collide — a retried batch reuses
        its own ids — so the single-index form would double-count)."""
        sa = ex_a.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_a"))
        sb = ex_b.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_b"))
        inter = (
            cands.join(
                ex_a.select(F.col(id_col).alias("a_id"), "s"), "a_id"
            )
            .join(ex_b.select(F.col(id_col).alias("b_id"), "s"), ["b_id", "s"])
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        return (
            inter.join(sa.select(F.col(id_col).alias("a_id"), "n_a"), "a_id")
            .join(sb.select(F.col(id_col).alias("b_id"), "n_b"), "b_id")
            .filter(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
                >= threshold
            )
            .select("a_id")
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint()  # source read once per batch
        try:
            corpus = spark.read.parquet(corpus_path)
            have_corpus = True
        except AnalysisException as e:
            cond = ""
            get_cond = getattr(e, "getCondition", None) or getattr(
                e, "getErrorClass", None
            )
            if get_cond is not None:
                cond = get_cond() or ""
            if "PATH_NOT_FOUND" not in cond and "PATH_NOT_FOUND" not in str(e):
                raise
            have_corpus = False

        sig_b = _sig(batch_df)
        ex_b = shingle_rows(
            batch_df, id_col, F.col(text_col), shingle_n, widen=False
        )

        dup_ids = None
        if have_corpus:
            bb = signature_band_buckets(sig_b, id_col, "sig", bands, rows_per_band)
            cb = signature_band_buckets(
                _sig(corpus), id_col, "sig", bands, rows_per_band
            )
            cands = (
                bb.select(F.col(id_col).alias("a_id"), "band", "bucket")
                .join(
                    cb.select(F.col(id_col).alias("b_id"), "band", "bucket"),
                    ["band", "bucket"],
                )
                .select("a_id", "b_id")
                .distinct()
            )
            ex_c = shingle_rows(
                corpus, id_col, F.col(text_col), shingle_n, widen=False
            )
            dup_ids = _cross_verified(cands, ex_b, ex_c)

        intra = lsh_candidate_pairs(
            sig_b, id_col, "sig", bands, rows_per_band, sig_len=num_hashes
        )
        intra_dups = verify_candidates_jaccard(
            intra, ex_b, id_col, threshold
        ).select(F.col("b_id").alias("a_id"))
        dup_ids = intra_dups if dup_ids is None else dup_ids.unionByName(intra_dups)

        fresh = batch_df.join(
            dup_ids.distinct().withColumnRenamed("a_id", id_col),
            id_col,
            "left_anti",
        )
        fresh.write.mode("append").parquet(corpus_path)

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
