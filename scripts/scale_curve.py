"""sf0.1 -> sf1.0 scale curve: run the headline queries plus the
round-4/7 scale representatives at both SFs (steady-state best-of-3,
same methodology as bench.py) and print one markdown table with the
time ratio per 10x data.

Usage: python scripts/scale_curve.py [sf01_dir] [sf10_dir]
(sf10_dir defaults to /tmp/sf1.0 — build it with make_scaled_sf.py).
Env: SCALE_CURVE_ONLY="q01_...,q42_..." restricts to a subset (for
chunked runs under a wall-clock cap); SCALE_CURVE_RUNS sets the
best-of count (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gov_data_pipeline_spark.queries import all_queries
from gov_data_pipeline_spark.session import get_spark

NAMES = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q06_asof_join",
    "q09_group_concat",
    "q10_window_rank",
    "q13_sessionize",
    "q41_jaccard_pairs",
    "q42_minhash_lsh",
    "q44_cosine_topk",
    "q47_text_stats",
    "q50_llm_enrich",
    "q57_winnowing",
    "q60_tumbling",
    "q66_cumulative_alerts",
    "q80_semantic_clusters_lsh",
    "q89_curation_pipeline",
    "q113_kmeans",
    # round-6 additions
    "q137_pagerank_mass",
    "q138_semantic_decontaminate",
    "q139_char_budget_mix",
    "q140_semantic_decontaminate_lsh",
    "q142_source_overlap",
    "q143_distinctive_terms",
    "q144_duplicate_passages",
    "q145_cluster_split",
    "q146_epoch_mixture",
    "q147_data_card",
    "q148_event_throttle",
    "q149_doc_pack_nfd",
    "q150_stream_throttle",
    # round-8 additions
    "q151_compact_roundtrip",
    "q152_jsonl_roundtrip",
    "q153_token_budget_pack",
    # round-10 additions (q164 re-listed: its ASCII canonicalization
    # regex moved to the \p{Alnum} fast path this round)
    "q164_quality_linear",
    "q167_quality_linear_unicode",
    "q168_quality_trained",
    "q169_unicode_normalized_dedup",
    "q170_script_profile",
    "q171_bigram_logprob",
    "q172_top_ngram_fraction",
    "q173_multilingual_curation",
    "q174_temperature_quota",
    "q175_phrase_merges",
    "q176_passage_removal",
    "q177_dsir_select",
    "q178_boilerplate_lines",
    "q179_pr_curve",
    "q180_lm_buckets",
    "q181_semdedup",
    "q182_contamination_fraction",
    "q183_dup_lines",
    "q184_mixture_materialize",
    "q185_bpe_encode",
    "q186_ann_recall",
    "q187_minhash_calibration",
    "q188_ivf_recall",
    "q189_margin_mining",
    # round-11 additions
    "q190_ann_multiprobe_recall",
    "q191_cjk_normalized_dedup",
    "q192_quality_linear_cjk",
    "q193_bpe_ranks_count",
    "q194_pii_scrub",
    "q195_bpe_budget_pack",
    # round-12 additions
    "q196_shuffled_export",
    "q197_ivf_probe_sweep",
    "q198_multiclass_route",
    "q199_pack_manifest",
]


def best_of_3(fn, spark) -> float:
    runs = int(os.environ.get("SCALE_CURVE_RUNS", "3"))
    fn().collect()  # codegen warm-up
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn().collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    spark = get_spark(app_name="scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    only = os.environ.get("SCALE_CURVE_ONLY")
    names = [n for n in NAMES if n in only.split(",")] if only else NAMES
    print("| query | sf0.1 | sf1.0 | ratio (10x data) |", flush=True)
    print("|---|---|---|---|", flush=True)
    for name in names:
        fn = registry[name]
        a = best_of_3(lambda: fn(spark, sf01), spark)
        b = best_of_3(lambda: fn(spark, sf10), spark)
        print(
            f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.2f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
