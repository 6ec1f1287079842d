"""Keyword search / relevance scoring over a document corpus (engine
extension — SURVEY §2.2 L8 family): TF-IDF and BM25, expressed as pure
DataFrame aggregations so Catalyst keeps the whole pipeline JVM-side.

The reference has no search operator; a training-data pipeline needs
one for quality filtering ("docs matching these domain keywords") and
retrieval-style dedup triage. Design for scale:

- tokens explode once; **query-term filtering happens before the
  aggregate**, so only rows for the handful of query terms ever reach
  a shuffle (the full token stream is reduced map-side to per-doc
  lengths only);
- document frequencies for the query terms are a tiny aggregate,
  broadcast back into the scoring join;
- scores use the Lucene BM25 form
  ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
  ``tf_norm = tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))``.

Ranking is on the 4-decimal-rounded score (ties broken by doc id) so
ordering is reproducible across engines — the DuckDB oracle (q68)
replicates every intermediate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(df: DataFrame, id_col: str, text: Column) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.trim(text)), r"\s+")).alias("term")
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text: Column,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms`` (docs matching no
    term are omitted). Returns (id, score) with score rounded to 4
    decimals; rank/limit downstream."""
    toks = _tokens(docs, id_col, text)
    # Per-doc length from the full stream (map-side combinable count),
    # corpus stats as 1-row broadcastable aggregates.
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # document tokens are lowercased by _tokens — normalize the query
    # the same way, or a capitalized query term silently matches nothing
    qt = toks.filter(F.col("term").isin([t.lower() for t in query_terms]))
    tf = qt.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "tf_norm",
            (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum(F.col("idf") * F.col("tf_norm")), 4).alias("bm25")
    )


def tfidf_scores(
    docs: DataFrame,
    id_col: str,
    text: Column,
    query_terms: list[str],
) -> DataFrame:
    """Classic ltc-style TF-IDF sum over query terms:
    ``(1 + ln(tf)) * ln(N / df)`` — the simpler cousin used when BM25's
    length normalization isn't wanted."""
    toks = _tokens(docs, id_col, text)
    n_docs = toks.select(id_col).distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    # match _tokens' lowercasing (see bm25_scores)
    qt = toks.filter(F.col("term").isin([t.lower() for t in query_terms]))
    tf = qt.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(
                    (1.0 + F.log(F.col("tf")))
                    * F.log(F.col("n_docs") / F.col("df"))
                ),
                4,
            ).alias("tfidf")
        )
    )
