from dynamodb_zero_etl_s3tables_spark.sources.testdata import (
    TABLES,
    load,
    register_views,
)

__all__ = ["TABLES", "load", "register_views"]
