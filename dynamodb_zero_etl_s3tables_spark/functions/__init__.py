from dynamodb_zero_etl_s3tables_spark.functions.decode import (
    attribute_value_schema,
    decode_export,
    decode_item_column,
    encode_row_to_ddb_json,
)

__all__ = [
    "attribute_value_schema",
    "decode_export",
    "decode_item_column",
    "encode_row_to_ddb_json",
]
