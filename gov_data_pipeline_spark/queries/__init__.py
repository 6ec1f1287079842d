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
# Re-derived after r10 from all CORRECTNESS_r*.json (tripwire:
# tests/test_registry.py::test_priority_rotation_is_fresh). Latest
# green rounds after r10: 35 queries at r07, 50 at r08, 50 at r09,
# 50 at r10. New round-11 queries (no driver row) lead; then the full
# r07 cohort; the 50 r08 greens follow in name order and straddle the
# sample boundary (tie across the boundary — allowed); r09/r10 greens
# fall through to module order.
_PRIORITY: tuple[str, ...] = (
    # new in r11 (no driver row yet)
    "q190_ann_multiprobe_recall",
    "q191_cjk_normalized_dedup",
    "q192_quality_linear_cjk",
    "q193_bpe_ranks_count",
    "q194_pii_scrub",
    "q195_bpe_budget_pack",
    # stalest cohort: last driver row r07 (35 queries)
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
    # r08 greens, name-ordered; with the 6 r11-new entries + 35 r07
    # above, the driver sample boundary (50) falls 9 entries into this
    # cohort — boundary ties are allowed
    "q06_asof_join",
    "q100_source_cap_sample",
    "q101_source_quality_gate",
    "q102_funnel",
    "q103_retention",
    "q104_embed_topk",
    "q105_corpus_diff",
    "q106_unpivot",
    "q107_negative_sampling",
    "q108_time_weighted_avg",
    "q109_session_paths",
    "q110_value_histogram",
    "q111_grouped_percentiles",
    "q112_correlation",
    "q113_kmeans",
    "q11_window_lag",
    "q13_sessionize",
    "q151_compact_roundtrip",
    "q152_jsonl_roundtrip",
    "q153_token_budget_pack",
    "q154_decontaminate_bloom",
    "q155_sparse_cosine_topk",
    "q156_interval_overlap",
    "q157_capped_sessions",
    "q158_containment_pairs",
    "q159_normalized_dedup",
    "q160_asof_nearest",
    "q161_token_bucket",
    "q17_pivot",
    "q27_sql_api",
    "q29_salted_agg",
    "q34_json",
    "q36_map",
    "q60_tumbling",
    "q61_sliding",
    "q62_session_window",
    "q63_stream_dedup",
    "q64_gapfill",
    "q66_cumulative_alerts",
    "q71_range_window",
    "q76_stream_join",
    "q79_ntile",
    "q80_semantic_clusters_lsh",
    "q81_xlsx_image_extract",
    "q82_docx_ingest",
    "q83_row_index_ingest",
    "q84_frame_sample",
    "q85_chunk_documents",
    "q86_sequence_pack",
    "q87_decontaminate",
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
