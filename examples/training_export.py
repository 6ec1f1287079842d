"""Runnable end-to-end training-data export: fixture documents ->
dedup -> benchmark decontamination -> quality gate -> per-source
budgeted mixture -> sequence packing -> sharded JSONL, composed from
the engine's public operators the way a pretraining-corpus job would
run them.

    python examples/training_export.py [sf_dir] [out_dir]

Stages (each prints its row count):

1. exact dedup                 — one sha2 digest shuffle
2. n-gram decontamination      — benchmark 5-grams BROADCAST against
                                 the corpus's exploded grams (the
                                 corpus never shuffles)
3. quality gate                — pure-projection score, scan-bound
4. char-budget mixture         — functions/sampling.budget_sample:
                                 stable-hash prefix per source within
                                 40% of that source's chars
5. sequence packing            — concat-then-chunk at 512 tokens,
                                 parallel per source shard
6. sharded JSONL export        — 4 gzip shards, the trainer handoff

Every stage is a column expression, a broadcast join, or a per-group
window — the identical plan runs on a 100 TB corpus; only stage 4/5's
per-source windows shuffle, and only by the mixture's own keys.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from gov_data_pipeline_spark.catalog import read_table
from gov_data_pipeline_spark.functions.chunking import pack_sequences
from gov_data_pipeline_spark.functions.sampling import budget_sample
from gov_data_pipeline_spark.functions.textstats import quality_score_col
from gov_data_pipeline_spark.operators.dedup import exact_dedup, word_shingles
from gov_data_pipeline_spark.session import get_spark
from gov_data_pipeline_spark.sources import write_jsonl


def run(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    """Returns per-stage row counts (the integration test's contract)."""
    counts: dict[str, int] = {}
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", "n_chars"
    )
    counts["loaded"] = docs.count()

    # --- 1. exact dedup -------------------------------------------------
    docs = exact_dedup(docs, ["text"], "doc_id")
    counts["deduped"] = docs.count()

    # --- 2. decontamination: every 29th doc donates its first five
    # words as a benchmark 5-gram; corpus docs sharing any benchmark
    # gram drop. Benchmark side is tiny -> broadcast semi-join; the
    # corpus's exploded grams never cross an exchange. ------------------
    grams = word_shingles(F.col("text"), 5)
    bench = (
        docs.filter(F.col("doc_id") % 29 == 0)
        .select(F.explode(F.slice(grams, 1, 1)).alias("g"))
        .distinct()
    )
    contaminated = (
        docs.select("doc_id", F.explode(grams).alias("g"))
        .join(F.broadcast(bench), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    docs = docs.join(F.broadcast(contaminated), "doc_id", "left_anti")
    counts["decontaminated"] = docs.count()

    # --- 3. quality gate ------------------------------------------------
    docs = docs.filter(quality_score_col(F.col("text")) >= 0.3)
    counts["quality_gated"] = docs.count()

    # --- 4. per-source char-budget mixture (40% of each source) ---------
    docs = budget_sample(docs, "doc_id", "source", "n_chars", 2, 5)
    counts["mixed"] = docs.count()

    # --- 5. sequence packing at 512 tokens, parallel per source ---------
    packed = pack_sequences(
        docs, "doc_id", "text", budget=512, partition_col="source"
    )
    counts["packed"] = packed.count()
    counts["packs"] = packed.select("source", "pack_id").distinct().count()

    # --- 6. seeded-shuffle sharded JSONL export -------------------------
    # shard membership and within-shard order are md5(seed:doc_id)
    # functions, so re-running the export reproduces every shard file
    # byte-for-byte — the trainer's reproducible-global-shuffle contract
    write_jsonl(
        packed.select("doc_id", "source", "pack_id", "n_tokens", "text"),
        out_dir,
        mode="overwrite",
        shards=4,
        compression="gzip",
        shuffle_by="doc_id",
        shuffle_seed=7,
    )
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_export"
    spark = get_spark(app_name="training-export-demo")
    counts = run(spark, sf_dir, out_dir)
    for stage, c in counts.items():
        print(f"{stage:>16}: {c}")
    print(f"shards written under {out_dir}")


if __name__ == "__main__":
    main()
