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
# Re-derived after r07 from all CORRECTNESS_r*.json (tripwire:
# tests/test_registry.py::test_priority_rotation_is_fresh). Latest
# green rounds: q79 r03; the 50-query r04 cohort r04; everything else
# r05 or r07. r07 greens are demoted past position 50 (fall through to
# module order).
_PRIORITY: tuple[str, ...] = (
    # new in r08 (no driver row yet)
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
    # stalest green in the suite: last driver row r03
    "q79_ntile",
    # the singly-verified r04 cohort, stalest-first (name-ordered
    # within the round); 38 of 50 fit in the sample alongside the
    # eleven r08-new queries — q88-q99 lead the overflow
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
    "q80_semantic_clusters_lsh",
    "q81_xlsx_image_extract",
    "q82_docx_ingest",
    "q83_row_index_ingest",
    "q84_frame_sample",
    "q85_chunk_documents",
    "q86_sequence_pack",
    "q87_decontaminate",
    # --- driver sample boundary (first 50 end here: 11 r08-new + q79 +
    # 38 of the r04 cohort; q88-q99 lead the rotation next round) ---
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
