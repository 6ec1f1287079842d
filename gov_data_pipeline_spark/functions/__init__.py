from gov_data_pipeline_spark.functions.textstats import (  # noqa: F401
    lang_id_col,
    n_tokens_col,
    punct_ratio_col,
    quality_score_col,
    stopword_ratio_col,
    word_fingerprint_col,
)
from gov_data_pipeline_spark.functions.chunking import (  # noqa: F401
    chunk_documents,
    pack_sequences,
)
