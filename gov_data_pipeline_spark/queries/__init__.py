"""Query registry.

Each submodule declares two dicts:

- ``QUERIES``: name -> ``Callable[[SparkSession, str], DataFrame]``
  (the PySpark implementation; ``str`` is the fixture directory);
- ``ORACLE``: name -> ANSI SQL string DuckDB can run on the same
  parquet tables, producing the identical result (same column names —
  the driver's comparator sorts columns by name before hashing).

Every registered query carries an oracle — including the HLL++/quantile
sketches (q26), which use a *bounds* oracle: the Spark side emits the
exact statistic plus booleans asserting each sketch landed inside its
documented accuracy guarantee, and DuckDB computes the same exact values
with ``TRUE`` literals for the booleans. The hash sketches (md5
families) and the streaming operators (batch twins) carry full
value-hash oracles; ``tests/test_registry.py`` pins total coverage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gov_data_pipeline_spark.queries import (
    corpus_ops,
    dedup_sim,
    events_analytics,
    ingest,
    llm_queries,
    quality,
    relational,
    scalar,
    stats_ml,
    stream_queries,
    textops,
)

_MODULES = (
    relational, scalar, textops, ingest, dedup_sim, llm_queries,
    stream_queries, quality, corpus_ops, events_analytics, stats_ml,
)

# The driver's per-round correctness run samples the FIRST 50 entries of
# ``queries()`` (insertion order).  Invariant for this tuple: queries with
# no driver-green row yet enumerate first, then greens from stalest round
# to freshest; everything green in the LATEST driver round is demoted past
# position 50 (falls through to module order).  Re-derive the ordering
# from CORRECTNESS_r{N}.json every round — never trust last round's order.
# Re-derived after r09 from all CORRECTNESS_r*.json (tripwire:
# tests/test_registry.py::test_priority_rotation_is_fresh). Latest
# green rounds after r09: 12 queries at r05 (q46-era cohort), 50 at
# r07, 50 at r08, 50 at r09. The 23 new round-10 queries (no driver
# row) lead; then the full r05 cohort; the 50 r07 greens follow in
# name order and straddle the
# boundary (tie across the boundary — allowed); r08/r09 greens fall
# through to module order.
_PRIORITY: tuple[str, ...] = (
    # new in r10 (no driver row yet)
    "q189_margin_mining",
    "q188_ivf_recall",
    "q187_minhash_calibration",
    "q186_ann_recall",
    "q184_mixture_materialize",
    "q185_bpe_encode",
    "q181_semdedup",
    "q182_contamination_fraction",
    "q183_dup_lines",
    "q177_dsir_select",
    "q178_boilerplate_lines",
    "q179_pr_curve",
    "q180_lm_buckets",
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
    # stalest cohort: last driver row r05
    "q46_cosine_neardup",
    "q47_text_stats",
    "q48_lang_id",
    "q49_fingerprint",
    "q57_winnowing",
    "q67_dedup_clusters",
    "q68_bm25",
    "q69_stratified_sample",
    "q70_frequent_terms",
    "q74_semantic_clusters",
    "q75_corpus_pipeline",
    "q77_fuzzy_join",
    # r05 cohort ends; r07 greens, name-ordered, straddle the boundary
    "q04_anti_join",
    "q05_band_join",
    "q07_rollup",
    "q08_cube",
    "q09_group_concat",
    "q10_window_rank",
    "q115_weighted_sample",
    "q116_mad_outliers",
    "q120_token_entropy",
    "q122_k_anonymity",
    "q128_expectations",
    "q12_running_sum",
    "q137_pagerank_mass",
    "q138_semantic_decontaminate",
    "q139_char_budget_mix",
    # --- driver sample boundary (first 50 end here: 23 r10-new +
    # 12 r05 + 15 r07; the 35 remaining r07 greens below are boundary
    # ties) ---
    "q140_semantic_decontaminate_lsh",
    "q141_jpeg_dims",
    "q142_source_overlap",
    "q143_distinctive_terms",
    "q144_duplicate_passages",
    "q145_cluster_split",
    "q146_epoch_mixture",
    "q147_data_card",
    "q148_event_throttle",
    "q149_doc_pack_nfd",
    "q14_topk_orders",
    "q150_stream_throttle",
    "q15_intersect",
    "q16_except",
    "q18_row_index",
    "q19_count_distinct",
    "q25_header_promotion",
    "q28_redact",
    "q30_string_funcs",
    "q31_regex",
    "q32_dates",
    "q42_minhash_lsh",
    "q43_simhash",
    "q45_ann_lsh",
    "q50_llm_enrich",
    "q51_llm_correction",
    "q52_multimodal",
    "q55_ann_ivf",
    "q56_cosine_neardup_gemm",
    "q58_overlap_pairs",
    "q59_incremental_dedup",
    "q65_hash_sample",
    "q72_upsert_latest",
    "q73_salted_join",
    "q78_grouping_sets",
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    missing = [name for name in _PRIORITY if name not in merged]
    if missing:
        raise ValueError(
            f"_PRIORITY names not defined by any query module: {missing}"
        )
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _PRIORITY:
        out[name] = merged.pop(name)
    out.update(merged)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
