from gov_data_pipeline_spark.sources.files import (  # noqa: F401
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    write_jsonl,
    write_orc,
    write_parquet,
)
from gov_data_pipeline_spark.sources.http import fetch_urls  # noqa: F401
from gov_data_pipeline_spark.sources.excel import (  # noqa: F401
    read_excel,
    write_excel,
)
from gov_data_pipeline_spark.sources.ftp_sink import FTPSink  # noqa: F401
