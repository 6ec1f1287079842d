"""Streaming corpus ingestion: the production shape of incremental
dedup (SURVEY L5/L6's incremental forms run continuously).

The reference ingests weekly batches sequentially; at 100 TB the same
pipeline runs as a stream of document batches where each micro-batch
must dedup against EVERYTHING already ingested without re-reading it
as documents. Two sinks, same contract:

- ``incremental_dedup_sink`` — exact dedup: the persisted corpus is
  consulted through ``operators.dedup.incremental_exact_dedup``, which
  reduces the seen side to distinct content hashes map-side before the
  anti-join — the increment shuffles digests, never historical
  documents.
- ``incremental_neardup_sink`` — MinHash-LSH near-dup: both sides
  reduce to one profile row per document (signature + shingle-hash
  set, one aggregate over a shuffle-free shingle relation), candidates
  come from a (band, bucket) equi-join, and the verify stage is an
  ``array_intersect`` over two profile lookups.

Only fresh rows append to the corpus path, so the corpus directory is
also the state: restarts resume from the checkpoint and the
already-appended files, no separate state store to rebuild. (In a
long-lived deployment the hash/bucket index would be persisted
bucketed next to the data; deriving it per batch keeps each operator a
pure function of the directory, which is what the tests pin.)

``foreachBatch`` gives exactly-once appends per micro-batch under the
checkpoint; a batch retry re-runs the dedup against the corpus as
already appended, so replayed duplicates still drop — the dedup itself
is the idempotence mechanism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import DataStreamWriter


def _pin_batch(df: DataFrame) -> DataFrame:
    """Per-batch pin for a frame with >1 consumer inside one
    foreachBatch invocation: EAGER localCheckpoint. All three forms
    were measured on the sf0.1 4-batch neardup bench (r11, PLANS.md):
    persist(MEMORY_AND_DISK) loses big (12.77 s vs ~8 — the cache's
    columnar encode of document text costs far more than the job it
    saves), and lazy localCheckpoint(eager=False) loses the read-once
    property exactly when it matters: the pinned frame's consumers are
    SIBLING STAGES of one job, scheduled concurrently, and lazy
    checkpoint blocks only exist after one of them finishes — so both
    recompute the source (back-to-back triples: lazy 9.05/9.07/9.29 s,
    eager 7.48/8.22 s at matched load). The eager pin's dedicated job
    is the price of actually computing once. Blocks are
    executor-local, freed by GC."""
    return df.localCheckpoint()


def _read_corpus_or_none(spark: SparkSession, corpus_path: str) -> DataFrame | None:
    """Read the persisted corpus, or ``None`` when no corpus EXISTS yet.

    "No corpus yet" is more than a missing path: a crashed first batch
    can leave the directory holding only an uncommitted ``_temporary``
    tree, and ops tooling can pre-create an empty directory — both read
    as UNABLE_TO_INFER_SCHEMA, and treating that as fatal would wedge
    the stream in a deterministic retry loop (the checkpoint replays
    the batch, the read fails identically, forever). A directory with
    zero committed parquet footers has no recoverable corpus data by
    definition, so both conditions mean "first batch". Every OTHER
    failure (listing race, store hiccup, corrupt footer on committed
    data) still raises so the checkpoint retries the batch — treating
    those as first-batch would skip the dedup join and permanently
    append duplicates.
    """
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(corpus_path)
    except AnalysisException as e:
        cond = ""
        get_cond = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", None
        )
        if get_cond is not None:
            cond = get_cond() or ""
        probe = cond or str(e)
        if "PATH_NOT_FOUND" in probe or "UNABLE_TO_INFER_SCHEMA" in probe:
            return None
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return None
        raise


def incremental_dedup_sink(
    stream_df: DataFrame,
    corpus_path: str,
    content_cols: list[str],
    id_col: str,
    checkpoint_dir: str,
    digest_sidecar: bool = False,
) -> DataStreamWriter:
    """Build the ``writeStream`` for streaming exact-dedup ingestion.

    Caller starts it (``.trigger(...).start()``); each micro-batch is
    deduped against the persisted corpus at ``corpus_path`` plus
    itself, and only fresh rows are appended.

    ``digest_sidecar=True`` persists each appended row's (id, content
    digest) under ``corpus_path + "/_content_digests"`` and joins the
    batch against THAT instead of re-hashing the corpus text — at
    100 TB the per-batch corpus cost drops from a full content scan to
    a 40-byte-per-row digest read. Same contract as
    ``incremental_neardup_sink(profile_sidecar=True)``: the ``_``
    prefix keeps the sidecar invisible to plain parquet reads of the
    corpus, rows that reached the corpus without digests (a crash
    between the two appends) self-heal via an ids anti-join on the
    next batch, and data is appended before digests so the crash
    window can only cost one batch of missed dedup, never rows.
    """
    from gov_data_pipeline_spark.operators.dedup import (
        _content_hash,
        exact_dedup,
        incremental_exact_dedup,
    )

    sidecar_path = corpus_path.rstrip("/") + "/_content_digests"

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Pin the micro-batch: the dedup lineage references it twice
        # (anti-join input and winners aggregate) and an unpinned
        # streaming source would be re-read once per reference. Eager
        # pin — see _pin_batch's A/B for why lazy loses read-once.
        batch_df = _pin_batch(batch_df)
        seen = _read_corpus_or_none(spark, corpus_path)
        healed = None
        if seen is None:
            fresh = exact_dedup(batch_df, content_cols, id_col)
        elif digest_sidecar:
            stored = _read_corpus_or_none(spark, sidecar_path)
            missing = (
                seen
                if stored is None
                else seen.join(stored.select(id_col), id_col, "left_anti")
            )
            # pinned: consumed by the dedup join AND the sidecar append
            healed = _pin_batch(
                missing.select(
                    F.col(id_col), _content_hash(content_cols).alias("digest")
                )
            )
            digests = (
                healed if stored is None else stored.unionByName(healed)
            )
            fresh = incremental_exact_dedup(
                batch_df,
                None,
                content_cols,
                id_col,
                seen_hashes=digests.select("digest"),
            )
        else:
            fresh = incremental_exact_dedup(batch_df, seen, content_cols, id_col)
        if digest_sidecar:
            fresh = _pin_batch(fresh)  # consumed by data + digests
        fresh.write.mode("append").parquet(corpus_path)
        if digest_sidecar:
            fresh_digests = fresh.select(
                F.col(id_col), _content_hash(content_cols).alias("digest")
            )
            if healed is not None:
                fresh_digests = fresh_digests.unionByName(healed)
            fresh_digests.write.mode("append").parquet(sidecar_path)

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
    profile_sidecar: bool = False,
    containment_threshold: float | None = None,
    containment_max_doc_freq: int | None = None,
) -> DataStreamWriter:
    """Streaming NEAR-dup ingestion: ``incremental_dedup_sink``'s
    MinHash-LSH sibling (SURVEY L6 run continuously). Each micro-batch
    drops documents whose exact shingle-Jaccard against the persisted
    corpus — or against a lower-id document in the same batch — meets
    ``threshold``; only novel documents append.

    ``profile_sidecar=True`` persists each appended document's MinHash
    profile (signature + shingle-hash set + size) under
    ``corpus_path + "/_minhash_profiles"`` and reads THAT per batch
    instead of re-profiling the corpus text — the 100 TB lever: total
    corpus-side work across K batches drops from O(K·corpus-text)
    (quadratic in ingested volume) to O(K·profile-bytes) + one ids-only
    anti-join per batch. The leading underscore keeps the sidecar
    invisible to every plain parquet read of ``corpus_path`` (Spark's
    file index skips ``_*`` paths), so the corpus directory contract is
    unchanged. The sidecar SELF-HEALS: rows that reached the corpus
    without profiles (a crash between the two appends) are detected by
    an ids anti-join each batch and re-profiled from text — the failure
    window costs one batch of missed dedup, never data loss (data is
    appended before profiles, so a replayed batch still drops against
    its own first append). Sketch params (shingle_n/num_hashes/bands)
    must stay constant for a given sidecar; delete the sidecar dir to
    re-bootstrap after changing them.

    Scale shape per batch: each side is consumed ONCE —
    ``minhash_doc_profile`` folds the shuffle-free shingle relation
    into one profile row per document (signature + shingle-hash set),
    deliberately NOT persisted: unlike q42's three-consumer pair
    stage, each per-batch profile has only two consumers and the
    recompute is cheaper than the cache materialization (measured
    +20% sink wall-clock with persist at sf0.1 — the opposite call
    from q42, for the same pattern, decided by measurement),
    banding projects that to (id, band, bucket) rows for the candidate
    equi-join, and the verify stage is ``array_intersect`` over two
    profile lookups (``verify_candidates_hashset``); nothing pairwise
    ever touches document bytes. The corpus side recomputes its
    profiles from text each batch to stay a pure function of the
    directory (what the tests pin); a long-lived deployment persists
    the profile/bucket index next to the data and this operator's plan
    loses its corpus-sized scan.

    Retry idempotence: a replayed batch's rows are exact dups of their
    own first append (Jaccard 1.0 >= any threshold), so they drop in
    the batch-vs-corpus stage — same mechanism as the exact sink.
    Greedy transitivity: if batch doc B near-dups batch doc A and A
    itself drops against the corpus, B still drops — B is transitively
    near the corpus, the standard greedy-dedup contract.

    ``containment_threshold`` adds the ASYMMETRIC excerpt-leak signal
    (q158/q163's ``C(A in B) = |sh(A) ∩ sh(B)| / |sh(A)|``) at ingest
    time — the shape LSH-Jaccard structurally misses: a short quote of
    a large corpus document has Jaccard ≈ |quote|/|doc| (tiny, under
    any band threshold) but containment ≈ 1. The probe is an exact
    inverted-index join over the shingle-hash sets the profiles
    ALREADY carry (explode ``hset`` — O(profile bytes), the text is
    never re-shingled), so with the sidecar the corpus-side cost per
    batch stays O(index), never O(corpus text). A batch document drops
    iff it is the CONTAINED side: its ratio into some corpus document
    meets the threshold, or — intra-batch — the per-edge subset-drop
    rule of ``operators/graph.containment_dedup`` (one-sided: the
    subset drops; mutual: the larger id drops). The reverse direction
    (a corpus document that turns out to be an excerpt of the NEW
    batch doc) is reported by nothing here: an append-only ingest sink
    cannot retract ingested rows — run the q163 batch pass for that.
    ``containment_max_doc_freq`` applies the same stop-shingle cap as
    the batch operators to the corpus posting lists (boilerplate
    shingles are the fan-out hazard; the docstring of
    ``cap_shingle_doc_freq`` has the math).
    """
    from gov_data_pipeline_spark.operators.dedup import (
        cap_shingle_doc_freq,
        lsh_candidate_pairs,
        minhash_doc_profile,
        shingle_rows,
        signature_band_buckets,
        verify_candidates_hashset,
    )

    def _profile(df: DataFrame) -> DataFrame:
        # distinct=False: the profile aggregate (min / collect_set) is
        # duplicate-insensitive, so the shingle relation costs zero
        # shuffles of its own.
        ex = shingle_rows(
            df, id_col, F.col(text_col), shingle_n, widen=False, distinct=False
        )
        return minhash_doc_profile(ex, id_col, num_hashes=num_hashes)

    sidecar_path = corpus_path.rstrip("/") + "/_minhash_profiles"

    def _corpus_profiles(
        spark, corpus: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """(full corpus profile, newly-healed profiles to persist)."""
        stored = _read_corpus_or_none(spark, sidecar_path)
        if stored is None:
            missing = corpus
        else:
            missing = corpus.join(
                stored.select(id_col), id_col, "left_anti"
            )
        # pinned (eager — _pin_batch): consumed by the dedup joins
        # AND the sidecar append
        heal = _pin_batch(_profile(missing))
        prof_c = heal if stored is None else stored.unionByName(heal)
        return prof_c, heal

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # eager pin (r11 A/B, see _pin_batch): the batch feeds the
        # profile aggregate and the final anti-join — two sibling
        # consumers, and only the eager form actually reads the
        # streaming source once
        batch_df = _pin_batch(batch_df)
        corpus = _read_corpus_or_none(spark, corpus_path)

        prof_b = _profile(batch_df)
        if containment_threshold is not None:
            # the containment probe adds a third and fourth consumer of
            # the batch profile — past the break-even where recompute
            # beat materialization (the q42 bet, re-decided per count)
            prof_b = _pin_batch(prof_b)
        healed = None
        dup_ids = None
        if corpus is not None:
            if profile_sidecar:
                prof_c, healed = _corpus_profiles(spark, corpus)
            else:
                prof_c = _profile(corpus)
            bb = signature_band_buckets(
                prof_b, id_col, "sig", bands, rows_per_band
            )
            cb = signature_band_buckets(
                prof_c, id_col, "sig", bands, rows_per_band
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
            # profile_b keeps the two id spaces separate: a retried
            # batch reuses its own ids, and a single shared profile
            # would conflate the batch row with its corpus twin.
            dup_ids = verify_candidates_hashset(
                cands, prof_b, id_col, threshold, profile_b=prof_c
            ).select("a_id")
            if containment_threshold is not None:
                # exact inverted-index probe over the profiles' shingle
                # sets: drop the batch doc when it is contained in any
                # corpus doc — the excerpt-leak direction an append-only
                # sink can act on
                ex_b = prof_b.select(
                    F.col(id_col).alias("a_id"), F.explode("hset").alias("__s")
                )
                ex_c = prof_c.select(
                    F.col(id_col).alias("b_id"), F.explode("hset").alias("__s")
                )
                if containment_max_doc_freq is not None:
                    ex_c = cap_shingle_doc_freq(
                        ex_c, "b_id", "__s", containment_max_doc_freq
                    )
                sizes_b = prof_b.select(
                    F.col(id_col).alias("a_id"), F.col("n").alias("n_a")
                )
                contained = (
                    ex_b.join(ex_c, "__s")
                    .groupBy("a_id", "b_id")
                    .agg(F.count(F.lit(1)).alias("__i"))
                    .join(sizes_b, "a_id")
                    .filter(
                        F.col("__i") / F.col("n_a") >= containment_threshold
                    )
                    .select("a_id")
                )
                dup_ids = dup_ids.unionByName(contained)

        intra = lsh_candidate_pairs(
            prof_b, id_col, "sig", bands, rows_per_band, sig_len=num_hashes
        )
        intra_dups = verify_candidates_hashset(
            intra, prof_b, id_col, threshold
        ).select(F.col("b_id").alias("a_id"))
        dup_ids = (
            intra_dups if dup_ids is None else dup_ids.unionByName(intra_dups)
        )
        if containment_threshold is not None:
            # intra-batch excerpt pairs: graph.containment_dedup's
            # per-edge subset-drop rule (one-sided -> the subset drops;
            # mutual -> the larger id), on raw ratios of exact counts
            ex_b2 = prof_b.select(
                F.col(id_col).alias("a_id"), F.explode("hset").alias("__s")
            )
            sz = prof_b.select(F.col(id_col).alias("a_id"), F.col("n"))
            pairs = (
                ex_b2.join(
                    ex_b2.select(
                        F.col("a_id").alias("b_id"), F.col("__s")
                    ),
                    "__s",
                )
                .filter(F.col("a_id") < F.col("b_id"))
                .groupBy("a_id", "b_id")
                .agg(F.count(F.lit(1)).alias("__i"))
                .join(sz, "a_id")
                .withColumnRenamed("n", "n_a")
                .join(sz.withColumnRenamed("a_id", "b_id"), "b_id")
                .withColumnRenamed("n", "n_b")
            )
            ca = F.col("__i") / F.col("n_a") >= containment_threshold
            cb = F.col("__i") / F.col("n_b") >= containment_threshold
            intra_cont = pairs.select(
                F.when(ca & cb, F.greatest("a_id", "b_id"))
                .when(ca, F.col("a_id"))
                .when(cb, F.col("b_id"))
                .alias("a_id")
            ).filter(F.col("a_id").isNotNull())
            dup_ids = dup_ids.unionByName(intra_cont)

        # no .distinct() on the dup-id set (r11): a left_anti join is
        # duplicate-insensitive on its right side, so the distinct was
        # a pure extra exchange+aggregate on the per-batch floor
        fresh = batch_df.join(
            dup_ids.withColumnRenamed("a_id", id_col),
            id_col,
            "left_anti",
        )
        if profile_sidecar:
            fresh = _pin_batch(fresh)  # consumed by data + profiles
        fresh.write.mode("append").parquet(corpus_path)
        if profile_sidecar:
            # data first, profiles second (see docstring for the
            # crash-window contract); healed backfills persist too
            fresh_prof = prof_b.join(
                fresh.select(id_col), id_col, "left_semi"
            )
            if healed is not None:
                fresh_prof = fresh_prof.unionByName(healed)
            fresh_prof.write.mode("append").parquet(sidecar_path)

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def scored_ingest_sink(
    stream_df: DataFrame,
    corpus_path: str,
    text_col: str,
    id_col: str,
    checkpoint_dir: str,
    weights: DataFrame,
    n_features: int = 1 << 18,
    intercept: int = 0,
    threshold: int = 0,
    hash_family: str = "xxhash64",
    token_classes: str = "ascii",
    quarantine_path: str | None = None,
) -> DataStreamWriter:
    """Learned quality filtering AT INGEST: every micro-batch is scored
    with the broadcast linear model (``operators/scoring.
    score_linear_model`` — the q164/q167 shape, optionally a model the
    engine trained itself via ``train_linear_model``), rows with
    ``logit >= threshold`` append to the corpus, and rejected rows
    optionally append to ``quarantine_path`` WITH their logits — the
    audit trail a filtering pipeline owes its operators (silently
    dropped data is undebuggable; a quarantine is greppable).

    Retry idempotence: a replayed batch's rows carry ids the corpus
    already holds, so an ids anti-join against the persisted corpus
    (and quarantine, when configured) drops them before scoring —
    cheaper than re-scoring, and the same mechanism either way. The
    model is scale-invariant per batch: one broadcast join + one
    batch-sized aggregate; the corpus-side cost is the ids projection
    only (parquet column pruning reads just ``id_col``).

    The streaming twin of the batch q164/q167/q168 family; composes
    with the dedup sinks by pointing this sink's output directory at
    their input stream (score -> dedup, the usual curation order when
    the filter is cheaper than the dedup index).
    """
    from gov_data_pipeline_spark.operators.scoring import score_linear_model

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # eager pin (see _pin_batch): read-once across sibling consumers
        batch_df = _pin_batch(batch_df)
        for prior_path in (corpus_path, quarantine_path):
            if prior_path is None:
                continue
            prior = _read_corpus_or_none(spark, prior_path)
            if prior is not None:
                batch_df = batch_df.join(
                    prior.select(id_col), id_col, "left_anti"
                )
        scored = score_linear_model(
            batch_df,
            id_col,
            F.col(text_col),
            weights,
            n_features=n_features,
            intercept=intercept,
            threshold=threshold,
            hash_family=hash_family,
            token_classes=token_classes,
        )
        if quarantine_path is not None:
            # two consumers of the scored frame: pin it once
            scored = _pin_batch(scored)
        scored.filter(F.col("kept")).drop("logit", "kept").write.mode(
            "append"
        ).parquet(corpus_path)
        if quarantine_path is not None:
            scored.filter(~F.col("kept")).drop("kept").write.mode(
                "append"
            ).parquet(quarantine_path)

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def decontaminating_ingest_sink(
    stream_df: DataFrame,
    corpus_path: str,
    text_col: str,
    id_col: str,
    checkpoint_dir: str,
    benchmark_grams: DataFrame,
    n: int = 13,
    quarantine_path: str | None = None,
    reliable_checkpoint: bool = False,
) -> DataStreamWriter:
    """Benchmark decontamination AT INGEST: every micro-batch's
    documents are gated on n-gram membership against the evaluation
    set (the q87 batch gate run continuously), clean rows append to
    the corpus, and contaminated rows optionally append to
    ``quarantine_path`` WITH their matched-gram count — the audit
    trail (same posture as ``scored_ingest_sink``'s logit column:
    silently dropped data is undebuggable).

    ``benchmark_grams``: one string column named ``s`` holding the
    eval set's distinct n-grams — built once, outside the stream
    (e.g. ``operators/dedup.word_shingles(text, 13)`` exploded over
    the benchmark corpus). It is broadcast into each batch's
    membership join, so per-batch cost is batch-sized; the benchmark
    set never re-derives. For a benchmark too large to broadcast, the
    q154 Bloom-bitset gate is the drop-in replacement (same verdicts
    on survivors because q154 exact-verifies).

    Gram semantics are exactly ``word_shingles``: distinct n-grams,
    documents shorter than ``n`` words contribute their full word-join
    (which only matches a benchmark gram of that exact short text).

    Retry idempotence: a replayed batch's ids anti-join against both
    output directories before the gate — the scored-sink mechanism.

    ``reliable_checkpoint``: the pinned benchmark set defaults to
    ``localCheckpoint`` (executor-local storage — zero extra config,
    right for local mode and tests). On a long-lived cluster stream
    that pin is the sink's one piece of irreplaceable distributed
    state: lose an executor and its blocks are gone, and EVERY
    subsequent micro-batch fails until the sink is rebuilt. Pass
    ``reliable_checkpoint=True`` (plus ``spark.sparkContext
    .setCheckpointDir``) to write the grams to reliable storage
    instead — the ``connected_components`` convention.
    """
    from gov_data_pipeline_spark.operators.dedup import word_shingles

    # Reserved-column guard (the sampling.py _guard_sample_rank
    # pattern): the gate joins an internal 'n_hit_grams' count onto the
    # user's frame and routes rows on its NULLness — a stream whose
    # schema already carries that name would silently mis-route every
    # row. Fail at construction, not per batch.
    clash = {c for c in stream_df.columns if c.lower() == "n_hit_grams"}
    if clash:
        raise ValueError(
            "decontaminating_ingest_sink: input stream already has "
            f"column(s) {sorted(clash)}; rename them first — "
            "'n_hit_grams' is the sink's internal hit-count column"
        )

    # Pin the benchmark set ONCE at sink construction: foreachBatch
    # would otherwise re-execute its full derivation (benchmark scan +
    # shingle explode) and re-broadcast it on EVERY micro-batch
    # (review-caught — the docstring's "never re-derives" was a claim,
    # not a property, until this line).
    benchmark_grams = (
        benchmark_grams.select("s").checkpoint()
        if reliable_checkpoint
        else benchmark_grams.select("s").localCheckpoint()
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # eager pin (see _pin_batch): read-once across sibling consumers
        batch_df = _pin_batch(batch_df)
        for prior_path in (corpus_path, quarantine_path):
            if prior_path is None:
                continue
            prior = _read_corpus_or_none(spark, prior_path)
            if prior is not None:
                batch_df = batch_df.join(
                    prior.select(id_col), id_col, "left_anti"
                )
        ex = batch_df.select(
            id_col, F.explode(word_shingles(F.col(text_col), n)).alias("s")
        )
        hits = (
            ex.join(F.broadcast(benchmark_grams.select("s")), "s", "left_semi")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hit_grams"))
        )
        gated = batch_df.join(F.broadcast(hits), id_col, "left")
        if quarantine_path is not None:
            # two consumers of the gated frame: pin it once
            gated = _pin_batch(gated)
        gated.filter(F.col("n_hit_grams").isNull()).drop(
            "n_hit_grams"
        ).write.mode("append").parquet(corpus_path)
        if quarantine_path is not None:
            gated.filter(F.col("n_hit_grams").isNotNull()).write.mode(
                "append"
            ).parquet(quarantine_path)

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
