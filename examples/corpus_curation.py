"""Runnable end-to-end corpus-curation demo — the q75 pipeline,
unrolled into its operator calls so each stage's effect is visible.

    python examples/corpus_curation.py [sf_dir]

Stages: load -> plant near-duplicates -> MinHash-LSH candidate pairs ->
exact-Jaccard verify -> connected-components clustering -> keep
canonical docs -> quality gate -> per-language stratified sample.
Prints row counts after every stage. Defaults to the smallest fixture.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from gov_data_pipeline_spark.catalog import read_table
from gov_data_pipeline_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_from_shingle_rows,
    shingle_rows,
    verify_candidates_jaccard,
)
from gov_data_pipeline_spark.operators.graph import dedup_clusters
from gov_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-curation-demo")

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    mutants = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" qq zz")).alias("text"),
        "lang",
    )
    corpus = docs.unionByName(mutants)
    print(f"corpus (docs + planted near-dups): {corpus.count()}")

    ex = shingle_rows(corpus, "doc_id", F.col("text"), 3, widen=False)
    sigs = minhash_from_shingle_rows(ex, "doc_id", num_hashes=32)
    cands = lsh_candidate_pairs(sigs, "doc_id", "sig", bands=8, rows_per_band=4)
    print(f"LSH candidate pairs: {cands.count()}")

    pairs = verify_candidates_jaccard(cands, ex, "doc_id", threshold=0.5)
    print(f"verified near-dup pairs (jaccard >= 0.5): {pairs.count()}")

    labeled = dedup_clusters(pairs.select("a_id", "b_id"), corpus, "doc_id")
    kept = labeled.filter(F.col("is_canonical"))
    print(f"canonical docs after clustering: {kept.count()}")

    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    gated = kept.withColumn("n_words", n_words).filter(F.col("n_words") >= 10)
    print(f"after quality gate (>= 10 words): {gated.count()}")

    from gov_data_pipeline_spark.functions.sampling import hash_bucket_col

    bucket = hash_bucket_col(F.col("doc_id"))
    cut = F.when(F.col("lang") == "en", F.lit(128)).otherwise(F.lit(256))
    sampled = gated.withColumn("hash_bucket", bucket).filter(F.col("hash_bucket") < cut)
    print("final sample by language:")
    for r in sampled.groupBy("lang").count().orderBy("lang").collect():
        print(f"  {r['lang']}: {r['count']}")


if __name__ == "__main__":
    main()
