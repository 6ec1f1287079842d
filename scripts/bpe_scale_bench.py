"""Realistic-vocabulary BPE throughput evidence (r12 verdict item #2).

The q193/q195 oracles pin the real-tokenizer adapter's CORRECTNESS on a
30-entry merge table; this script measures the adapter's COST at a
production vocabulary size: a deterministic ~50k-rank synthetic table
(functions/tokenizer.synthetic_mergeable_ranks — tiktoken table shape,
every [a-z] 2/3-gram plus md5-sampled 4-grams, so the per-word merge
loop actually cascades like it would under a learned English vocab).
The table round-trips through dump_mergeable_ranks /
load_mergeable_ranks, so the tiktoken FILE-FORMAT path is what's
measured, not just the in-memory dict.

Per SF dir it reports, best-of-N (scale_curve methodology):

- count: full-corpus ``bpe_token_count`` reduced to one row
  (docs, words, tokens, wall secs, tokens/sec, words/sec);
- pack:  the q195 shape — next-fit-decreasing packing budgeted on the
  real counts (capacity 512), reduced to bin stats.

Usage: python scripts/bpe_scale_bench.py [sf_dir ...]
Defaults: /root/testdata/sf0.1 /tmp/sf1.0
Env: BPE_BENCH_RANKS (vocab size, default 50304), BPE_BENCH_RUNS
(best-of count, default 3).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gov_data_pipeline_spark.catalog import read_table
from gov_data_pipeline_spark.functions.chunking import pack_documents_nfd
from gov_data_pipeline_spark.functions.sampling import hash_bucket_col
from gov_data_pipeline_spark.functions.tokenizer import (
    bpe_token_count,
    dump_mergeable_ranks,
    load_mergeable_ranks,
    synthetic_mergeable_ranks,
)
from gov_data_pipeline_spark.session import get_spark


def best_of(fn, spark, runs: int):
    fn()  # codegen + worker warm-up
    best, out = float("inf"), None
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best, out


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1.0"]
    n_ranks = int(os.environ.get("BPE_BENCH_RANKS", "50304"))
    runs = int(os.environ.get("BPE_BENCH_RUNS", "3"))

    t0 = time.perf_counter()
    ranks = synthetic_mergeable_ranks(n_ranks)
    build_s = time.perf_counter() - t0
    with tempfile.NamedTemporaryFile(suffix=".tiktoken", delete=False) as f:
        path = f.name
    dump_mergeable_ranks(ranks, path)
    size_mb = os.path.getsize(path) / 1e6
    ranks = load_mergeable_ranks(path)  # measure THROUGH the file format
    os.unlink(path)
    print(
        f"vocab: {len(ranks)} ranks, file {size_mb:.1f} MB, "
        f"built in {build_s:.1f}s",
        flush=True,
    )

    spark = get_spark(app_name="bpe_scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        docs = read_table(spark, d, "documents").select("doc_id", "text")

        def count_run():
            return docs.select(
                bpe_token_count(F.col("text"), ranks).alias("n"),
                F.size(F.split(F.col("text"), r"[ \t\n\f\r]+")).alias("w"),
            ).agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("w").alias("words"),
                F.sum("n").alias("tokens"),
            ).collect()[0]

        count_s, row = best_of(count_run, spark, runs)

        def pack_run():
            sized = docs.select(
                "doc_id",
                bpe_token_count(F.col("text"), ranks).alias("n_tokens"),
                (hash_bucket_col(F.col("doc_id")) % 8).cast("int").alias(
                    "shard"
                ),
            )
            return pack_documents_nfd(
                sized, "doc_id", "n_tokens", "shard", capacity=512
            ).agg(
                F.count(F.lit(1)).alias("docs"),
                F.max("bin").alias("max_bin"),
            ).collect()[0]

        pack_s, prow = best_of(pack_run, spark, runs)

        print(json.dumps({
            "sf_dir": d,
            "n_ranks": len(ranks),
            "docs": row["docs"],
            "words": int(row["words"]),
            "tokens": int(row["tokens"]),
            "count_sec": round(count_s, 2),
            "tokens_per_sec": int(row["tokens"] / count_s),
            "words_per_sec": int(row["words"] / count_s),
            "pack_sec": round(pack_s, 2),
            "pack_docs": prow["docs"],
            "pack_max_bin": int(prow["max_bin"]),
        }), flush=True)


if __name__ == "__main__":
    main()
