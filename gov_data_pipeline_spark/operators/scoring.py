"""Hashed-feature linear model scoring — the learned quality-filter
shape (fastText / CCNet / FineWeb-style classifiers) at corpus scale.

The heuristic quality signals (``functions/textstats.py``: length,
punctuation, stopword ratios — q47/q48) are rule-based; production
pipelines follow them with a LEARNED filter: a linear model over
hashed bag-of-words features, scored over every document. The model
is millions of documents small — feature_id -> weight — so the Spark
shape is **model-as-a-table**: broadcast the weights DataFrame and
score with one explode + one broadcast join + one sum aggregate, all
whole-stage codegen. No UDF, no Python, no per-row vector object.

Why hashed features: the hashing trick (Weinberger et al., ICML'09)
fixes the feature space at ``n_features`` regardless of vocabulary, so
the weights table never grows with the corpus and the scorer never
needs a vocabulary shuffle — exactly what survives at 100 TB, where
the vocabulary alone would dwarf a broadcast.

Integer fixed-point logits: weights are int64 milli-units and the
logit is an exact int64 sum, so scores — and the keep decision — are
bit-identical across engines, partition orders, and retries. The
sigmoid is deliberately NOT applied: it is monotone, so thresholding
on the logit is thresholding on the probability, and exp() ulps differ
across engines where integer sums cannot.

Hash families mirror the MinHash convention (``operators/dedup.py``):
``xxhash64`` (JVM-fastest) for production, ``md5`` (via ``md5_h1h2``)
when a cross-engine differential oracle runs beside the pipeline —
q164 ships the md5 form so DuckDB reproduces every logit bit-for-bit.

No reference analogue (the reference's enrichment is LLM-per-row,
``utils/openai*.py``); this is SURVEY §2.2 L8 extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from gov_data_pipeline_spark.operators.dedup import md5_h1h2


def _feature_hash(token: Column, n_features: int, hash_family: str) -> Column:
    if hash_family == "md5":
        h1, _ = md5_h1h2(token)
        return F.pmod(h1, F.lit(n_features)).cast("long")
    return F.pmod(F.xxhash64(token), F.lit(n_features)).cast("long")


def hashed_token_features(
    df: DataFrame,
    id_col: str,
    text: Column,
    n_features: int = 1 << 18,
    bigrams: bool = True,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, feature_id, tf) hashed bag-of-words rows.

    Tokens are the whitespace words of the ASCII-canonical text
    (``canonical_text_col`` semantics inlined: strip-to-alnum BEFORE
    lower, the cross-engine-safe normalization), plus adjacent-word
    bigrams when ``bigrams`` — fastText's default feature set. NULL /
    empty / whitespace-only text yields no rows (scorers left-join and
    coalesce to the intercept).

    ONE Generate (explode) over ONE scan — unigrams and bigrams are
    built as arrays from the same split and concatenated BEFORE the
    explode (a unioned second explode would re-scan the corpus text,
    doubling the dominant cost at 100 TB); the term explosion is the
    only row amplification and it is linear in corpus tokens.
    """
    empty = F.array().cast("array<string>")
    canon = F.lower(F.trim(F.regexp_replace(text, "[^A-Za-z0-9]+", " ")))
    ws = F.split(canon, " ")
    uni = F.when(F.length(canon) > 0, ws).otherwise(empty)
    grams_arr = uni
    if bigrams:
        # adjacent bigrams: zip the split against its shifted tail —
        # stays inside codegen, no second pass over the text
        bi = F.when(
            F.size(ws) >= 2,
            F.zip_with(
                F.slice(ws, 1, F.size(ws) - 1),
                F.slice(ws, 2, F.size(ws) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(empty)
        grams_arr = F.concat(uni, bi)
    grams = df.select(
        F.col(id_col), F.explode(grams_arr).alias("__g")
    )
    return (
        grams.select(
            id_col,
            _feature_hash(F.col("__g"), n_features, hash_family).alias(
                "feature_id"
            ),
        )
        .groupBy(id_col, "feature_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def score_linear_model(
    docs: DataFrame,
    id_col: str,
    text: Column,
    weights: DataFrame,
    n_features: int = 1 << 18,
    intercept: int = 0,
    threshold: int = 0,
    bigrams: bool = True,
    hash_family: str = "xxhash64",
    feature_col: str = "feature_id",
    weight_col: str = "weight",
) -> DataFrame:
    """Score every document with a broadcast linear model: returns
    ``docs`` + ``logit`` (exact int64, milli-units — intercept plus
    Σ tf·weight over the document's hashed features) + ``kept``
    (``logit >= threshold``).

    ``weights``: (feature_id, weight int64) — the trained model as a
    DataFrame. It is broadcast explicitly: at any realistic size
    (≤ tens of MB for 2^18-2^20 features) shipping the model to every
    executor beats shuffling corpus-sized feature rows by orders of
    magnitude; features that miss the table score 0 (inner join drops
    them — sparse models stay sparse).

    Plan: explode → hash → broadcast-join weights → per-doc sum →
    left-join back onto ``docs`` (zero-feature documents keep the
    intercept). The corpus shuffles ONCE, on ``id_col``, for the
    per-doc sum; nothing else moves it.
    """
    feats = hashed_token_features(
        docs.select(id_col, text.alias("__text")),
        id_col,
        F.col("__text"),
        n_features=n_features,
        bigrams=bigrams,
        hash_family=hash_family,
    )
    w = weights.select(
        F.col(feature_col).alias("feature_id"),
        F.col(weight_col).cast("long").alias("__w"),
    )
    sums = (
        feats.join(F.broadcast(w), "feature_id")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("__w")).alias("__dot"))
    )
    out = docs.join(sums, id_col, "left").withColumn(
        "logit",
        (F.coalesce(F.col("__dot"), F.lit(0)) + F.lit(intercept)).cast(
            "long"
        ),
    )
    return out.drop("__dot").withColumn(
        "kept", F.col("logit") >= F.lit(threshold)
    )


def pseudo_weights(
    spark, n_features: int = 1 << 18, spread: int = 1000
) -> DataFrame:
    """Deterministic (feature_id, weight) table spanning the full
    feature space: weight = md5-derived value in [-spread, +spread]
    milli-units. Stands in for a trained model in fixtures and
    benchmarks — same cardinality, same broadcast size, same join
    shape — and reproduces bit-for-bit in any md5-capable engine
    (DuckDB builds the identical table from ``range(n)``)."""
    h1, _ = md5_h1h2(F.col("id").cast("string"))
    return spark.range(n_features).select(
        F.col("id").alias("feature_id"),
        (F.pmod(h1, F.lit(2 * spread + 1)) - spread).alias("weight"),
    )
