"""gov_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
pipeline ``Xpos587/gov-data-pipeline`` (see SURVEY.md), built Spark-first:

- the DataFrame/SQL API declares every logical plan; Catalyst + Tungsten
  pick the physical strategy (broadcast vs sort-merge joins, partial
  aggregation, whole-stage codegen, AQE re-planning);
- Python only runs inside Arrow-batched ``pandas_udf`` / ``mapInPandas``
  where built-in operators genuinely can't express the semantics
  (NFKC normalization, LLM enrichment batches, multimodal decode);
- streams run on Structured Streaming with watermarks.

Layout
------
- ``session``     SparkSession factory tuned for the target scale
- ``catalog``     fixture-table registry (parquet star schema + docs)
- ``transforms``  reference-semantics text/header/merge transforms
- ``operators``   relational operators Spark lacks as built-ins
                  (as-of join, top-k per group, sessionize, dedup, ANN)
- ``functions``   scalar function surface (NFKC, cosine, fingerprints)
- ``sources``     non-parquet sources (Excel, HTTP fetch) and sinks
- ``streaming``   Structured Streaming windows/watermark helpers
- ``llm``         batched async model-call runtime (mockable)
"""

__version__ = "0.1.0"

from gov_data_pipeline_spark.session import get_spark  # noqa: F401
from gov_data_pipeline_spark.catalog import load_tables, register_views  # noqa: F401
