from dynamodb_zero_etl_s3tables_spark.streaming.cdc import (
    CHANGELOG_EXTRA_FIELDS,
    apply_changes_stream,
    changelog_schema,
    read_changelog_stream,
)
from dynamodb_zero_etl_s3tables_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)

__all__ = [
    "CHANGELOG_EXTRA_FIELDS",
    "apply_changes_stream",
    "changelog_schema",
    "read_changelog_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stream_dedup",
]
