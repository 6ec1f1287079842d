"""Query registry.

Each submodule declares two dicts:

- ``QUERIES``: name -> ``Callable[[SparkSession, str], DataFrame]``
  (the PySpark implementation; ``str`` is the fixture directory);
- ``ORACLE``: name -> ANSI SQL string DuckDB can run on the same
  parquet tables, producing the identical result (same column names —
  the driver's comparator sorts columns by name before hashing).

Names missing from ``ORACLE`` get the driver's weaker rows-only check;
that set is exactly ``{q26_approx_agg}`` — the HLL++/quantile sketches
with no cross-engine-exact form. Everything else, including the hash
sketches (md5 families) and the streaming operators (batch twins),
carries a full value-hash oracle; ``tests/test_registry.py`` pins the
set.
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
# ``queries()`` (insertion order).  Queries that have never had a driver
# CORRECTNESS row — or whose last sample predates their oracle — are listed
# here so they enumerate first; everything else (already driver-green in
# r01/r02) follows in module order.  New queries added in a round should be
# appended here until they earn a green row.
_PRIORITY: tuple[str, ...] = (
    # never driver-green in any round (r03 errored on the events read,
    # fixed in catalog.read_table this round)
    "q60_tumbling",
    "q61_sliding",
    "q62_session_window",
    "q63_stream_dedup",
    "q64_gapfill",
    "q66_cumulative_alerts",
    "q76_stream_join",
    # new in round 4
    "q80_semantic_clusters_lsh",
    "q81_xlsx_image_extract",
    "q82_docx_ingest",
    "q83_row_index_ingest",
    "q84_frame_sample",
    "q85_chunk_documents",
    "q86_sequence_pack",
    "q87_decontaminate",
    "q88_repetition_filter",
    "q89_curation_pipeline",
    # new in round 5
    "q90_pii_redact",
    "q91_scd2_history",
    "q92_bucketed_join",
    "q93_outlier_zscore",
    # new in round 6
    "q94_unigram_logprob",
    "q95_inverted_index",
    "q96_winsorize",
    "q97_time_rollup",
    "q98_point_in_time_join",
    "q99_hybrid_retrieval",
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
    # r03 events-read casualties, need their re-green row
    "q06_asof_join",
    "q11_window_lag",
    "q13_sessionize",
    "q17_pivot",
    "q27_sql_api",
    "q29_salted_agg",
    "q34_json",
    "q36_map",
    "q71_range_window",
    # new in round 7 (statistical profiling / ML family). Positions
    # 48+ of this tuple: with 47 never-sampled/errored entries ahead
    # of them (the 7 streaming + 38 round-4/5/6 queries + 9 r03
    # casualties, all of which the round-3 verdict orders re-greened
    # first), only q111-q113 fit the driver's 50-query window this
    # rotation; q114-q119 are locally oracle-verified at three SFs and
    # take the next rotation's slots.
    "q111_grouped_percentiles",
    "q112_correlation",
    "q113_kmeans",
    "q114_psi_drift",
    "q115_weighted_sample",
    "q116_mad_outliers",
    "q117_ohlc_bars",
    "q118_embed_quantize",
    "q119_trend_regression",
    "q120_token_entropy",
    "q121_zipf_slope",
    "q122_k_anonymity",
    "q123_markov_transitions",
    "q124_ab_welch",
    "q125_heavy_hitters",
    "q126_hourly_percentile_bands",
    "q127_time_to_convert",
    "q128_expectations",
    # stalest greens, r01 first then r02 (the driver samples the first
    # 50 names of this whole tuple — entries past 50 wait for the next
    # rotation, so the oldest driver rows must enumerate first)
    "q41_jaccard_pairs",
    "q44_cosine_topk",
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
    "q40_exact_dedup",
    "q20_clean_text",
    "q21_reg_num",
    "q22_exclusion",
    "q23_clean_cell",
    "q24_merge_continuation",
    "q33_math",
    "q35_array",
    "q37_base64",
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
