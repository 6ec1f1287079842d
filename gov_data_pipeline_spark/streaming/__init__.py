from gov_data_pipeline_spark.streaming.stateful import (  # noqa: F401
    ALERT_SCHEMA,
    capped_session_stats,
    cumulative_alerts,
    throttle_dedup,
    token_bucket_throttle,
)
from gov_data_pipeline_spark.streaming.ingest import (  # noqa: F401
    decontaminating_ingest_sink,
    incremental_dedup_sink,
    incremental_neardup_sink,
    scored_ingest_sink,
)
from gov_data_pipeline_spark.streaming.monitor import (  # noqa: F401
    psi_drift_sink,
    reference_profile,
)
from gov_data_pipeline_spark.streaming.rollup import (  # noqa: F401
    incremental_hourly_rollup_sink,
    read_hourly_rollup,
)
from gov_data_pipeline_spark.streaming.windows import (  # noqa: F401
    EVENTS_SCHEMA,
    click_purchase_join,
    dedup_within_watermark,
    read_events_stream,
    session_counts,
    sliding_stats,
    tumbling_counts,
)
