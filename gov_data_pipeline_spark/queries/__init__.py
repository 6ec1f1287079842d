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
# Re-derived after r08 from all CORRECTNESS_r*.json (tripwire:
# tests/test_registry.py::test_priority_rotation_is_fresh). Latest
# green rounds after r08: 12 queries at r04 (q88-q99), 45 at r05,
# 50 at r07, 50 at r08. The sample = the full r04 cohort + the 38
# name-first r05 greens; the remaining 7 r05 greens lead the overflow
# (tie across the boundary — allowed), r07/r08 greens fall through to
# module order.
_PRIORITY: tuple[str, ...] = (
    # new in r09 (no driver row yet)
    "q162_excel_roundtrip",
    "q163_containment_dedup",
    "q164_quality_linear",
    "q165_eval_sample",
    "q166_column_profile",
    # stalest cohort: last driver row r04
    "q88_repetition_filter",
    "q89_curation_pipeline",
    "q90_pii_redact",
    "q91_scd2_history",
    "q92_bucketed_join",
    "q93_outlier_zscore",
    "q94_unigram_logprob",
    "q95_inverted_index",
    "q96_winsorize",
    "q97_time_rollup",
    "q98_point_in_time_join",
    "q99_hybrid_retrieval",
    # r05 greens, name-ordered; first 38 fit in the sample
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_semi_join",
    "q114_psi_drift",
    "q117_ohlc_bars",
    "q118_embed_quantize",
    "q119_trend_regression",
    "q121_zipf_slope",
    "q123_markov_transitions",
    "q124_ab_welch",
    "q125_heavy_hitters",
    "q126_hourly_percentile_bands",
    "q127_time_to_convert",
    "q129_html_extract",
    "q130_url_normalize",
    "q131_pagerank",
    "q132_sitemap_extract",
    "q133_robots_gate",
    "q134_image_dims",
    "q135_media_meta",
    "q136_parquet_roundtrip",
    "q20_clean_text",
    "q21_reg_num",
    "q22_exclusion",
    "q23_clean_cell",
    "q24_merge_continuation",
    "q26_approx_agg",
    "q33_math",
    "q35_array",
    "q37_base64",
    "q40_exact_dedup",
    "q41_jaccard_pairs",
    "q44_cosine_topk",
    # --- driver sample boundary (first 50 end here: 5 r09-new +
    # 12 r04 + 33 r05; the 12 remaining r05 greens below are boundary
    # ties) ---
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
