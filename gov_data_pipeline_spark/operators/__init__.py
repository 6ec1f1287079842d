from gov_data_pipeline_spark.operators.relational import (  # noqa: F401
    asof_join,
    attach_row_index,
    sessionize,
    top_k_per_group,
)
