"""Corpus-preparation operators for training-data pipelines:
overlapping document chunking and token-budget sequence packing
(north-star extensions; no reference ancestor — the reference stops at
registry rows, these are the ops a 100 TB pretraining corpus needs
between dedup and the trainer).

Both are pure column expressions / windows — no UDFs, no collect:

- ``chunk_documents``: each document explodes into fixed-size
  word-window chunks with overlap (the standard retrieval/embedding
  chunker). Explosion happens per row inside the task; cost is linear
  in corpus size and the explode factor is bounded by
  ``len(doc) / stride``.
- ``pack_sequences``: concat-then-chunk packing — documents are laid
  end-to-end in a deterministic order and cut into fixed token-budget
  blocks; each document is labeled with the block its first token
  lands in. The running total is a window sum; partition by a corpus
  shard key (language, source, bucket) so the window never funnels
  through one task — which also matches how packing is actually run
  (per-shard, monolingual).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from gov_data_pipeline_spark.functions.textstats import n_tokens_col


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 20,
    overlap: int = 5,
    chunk_id_col: str = "chunk_id",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Explode each document into overlapping word-window chunks.

    Chunk ``i`` covers words ``[i*stride, i*stride + chunk_size)`` with
    ``stride = chunk_size - overlap``; every document yields at least
    one chunk (short docs yield themselves). All arithmetic is
    expression-level (split / sequence / slice), so the plan is a
    single Generate over the scan — no shuffle until something
    downstream needs one.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("chunk_documents: need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(ws) - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias(chunk_id_col),
            F.concat_ws(" ", F.slice(ws, i * stride + 1, chunk_size)).alias(
                chunk_col
            ),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("__c")
    ).select(
        id_col,
        F.col(f"__c.{chunk_id_col}").alias(chunk_id_col),
        F.col(f"__c.{chunk_col}").alias(chunk_col),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str | list[str],
    text_col: str,
    budget: int = 512,
    partition_col: str | None = None,
    tokens: Column | None = None,
    n_tokens_out: str = "n_tokens",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid
    end-to-end in (``partition_col``,) ``id_col`` order and cut every
    ``budget`` tokens; each document gets the 0-based block index its
    FIRST token falls into.

    ``id_col`` may be a list of columns for composite orders (e.g.
    ``["doc_id", "chunk_id"]`` when packing chunks — a synthesized
    single key like ``doc_id*K + chunk_id`` collides once a document
    exceeds K chunks, making the pack order nondeterministic).

    ``tokens`` defaults to the engine's BPE-ish token count
    (``n_tokens_col``); pass a column to plug a real tokenizer's
    counts. With ``partition_col`` the running sum parallelizes per
    shard (the scale path); without it the window is global —
    single-task ordering, small-corpus use only.
    """
    if budget < 1:
        # Loud driver-side error: budget=0 would reach the executors as
        # floor(x / 0.0) = Infinity and die in the long cast under ANSI.
        raise ValueError(f"pack_sequences: budget must be >= 1, got {budget}")
    order_cols = [id_col] if isinstance(id_col, str) else list(id_col)
    tok = tokens if tokens is not None else n_tokens_col(F.col(text_col))
    part = [partition_col] if partition_col else []
    w = (
        (W.partitionBy(*part) if part else W.partitionBy())
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_tok = df.withColumn(n_tokens_out, tok)
    cum_before = F.sum(F.col(n_tokens_out)).over(w) - F.col(n_tokens_out)
    return with_tok.withColumn(
        pack_col,
        F.floor(cum_before / F.lit(float(budget))).cast("long"),
    )


def pack_documents_nfd(
    df: DataFrame,
    id_col: str,
    size_col: str,
    shard_col: str,
    capacity: int,
) -> DataFrame:
    """Whole-document next-fit-decreasing bin packing per shard:
    documents are NEVER split across bins (the SFT/eval-data packer —
    ``pack_sequences`` is the pretraining concat-then-chunk form that
    splits at the budget boundary). Within each shard, documents sort
    by (size desc, id) and a single sequential pass opens a new bin
    whenever the current one cannot fit the next document; an oversize
    document occupies a bin alone.

    Capacity-reset accumulation is NON-ASSOCIATIVE — no window or
    aggregate expresses it — so this is the documented escape hatch:
    one Arrow-batched ``applyInPandas`` per shard, sequential only
    WITHIN a shard, parallel across shards. Choose the shard count ~
    cluster parallelism; each shard's (id, size) rows must fit in one
    task (they are two numeric columns — millions of documents per
    shard is fine; the text itself never enters this operator).
    """
    import pandas as pd

    if capacity < 1:
        raise ValueError(f"pack_documents_nfd: capacity must be >= 1, got {capacity}")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL size packs as 0 and is REPORTED as 0 (the oracle's
        # coalesce twin) — a sort key and the output must agree on it
        pdf = pdf.assign(**{size_col: pdf[size_col].fillna(0).astype("int64")})
        pdf = pdf.sort_values(
            [size_col, id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        bins: list[int] = []
        cur, used = 0, capacity + 1  # forces bin 1 open on the first row
        for s in pdf[size_col]:
            if used + s > capacity:
                cur += 1
                used = int(s)
            else:
                used += int(s)
            bins.append(cur)
        pdf["bin"] = pd.array(bins, dtype="int32")
        return pdf[[shard_col, id_col, size_col, "bin"]]

    from pyspark.sql import types as T

    # output schema derived from the INPUT column types (string ids /
    # non-int shards work), plus the computed bin
    narrow = df.select(shard_col, id_col, size_col)
    size_type = narrow.schema[size_col].dataType
    if not isinstance(
        size_type, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    ):
        raise TypeError(
            f"pack_documents_nfd: {size_col} must be integral (got "
            f"{size_type.simpleString()}); cast token/char counts first"
        )
    out_schema = T.StructType(
        [*narrow.schema.fields, T.StructField("bin", T.IntegerType())]
    )
    return narrow.groupBy(shard_col).applyInPandas(_pack, out_schema)
