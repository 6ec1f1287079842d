from gov_data_pipeline_spark.llm.client import (  # noqa: F401
    AuthError,
    LLMRequest,
    MockLLMClient,
    OpenAICompatClient,
    RateLimitError,
    TransientAPIError,
    call_with_retry,
)
from gov_data_pipeline_spark.llm.runtime import llm_map  # noqa: F401
from gov_data_pipeline_spark.llm.enrich import (  # noqa: F401
    brand_variants,
    clean_brand_prompt_col,
    correct_rows,
    enrich_table,
    ocr_enrich,
)
