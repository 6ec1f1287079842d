from gov_data_pipeline_spark.transforms.text import (  # noqa: F401
    clean_cell_col,
    canonical_text_col,
    clean_text_col,
    is_excluded_col,
    nfkc_normalize,
    normalize_reg_num_col,
    pii_count_col,
    scrub_pii_col,
    strip_all_strings,
    cast_all_string,
)
from gov_data_pipeline_spark.transforms.headers import (  # noqa: F401
    clean_column_name,
    dedup_column_names,
    pad_ragged_rows,
    promote_headers,
)
from gov_data_pipeline_spark.transforms.merge import (  # noqa: F401
    merge_continuation_rows,
)
