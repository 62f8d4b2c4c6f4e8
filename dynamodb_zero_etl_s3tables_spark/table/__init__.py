from dynamodb_zero_etl_s3tables_spark.table.merge import (
    latest_per_key,
    merge_changes,
)

__all__ = ["latest_per_key", "merge_changes"]
