"""PySpark-native analytics engine with the capabilities of
LeeroyHannigan/dynamodb-zero-etl-s3tables (an AWS CDK construct that
provisions DynamoDB -> Iceberg-on-S3 zero-ETL replication, queryable
with SQL; see reference README.md:10-12).

This package re-expresses both layers of the reference Spark-first:

* control plane  -> ``spec`` (validation), ``plans`` (staged pipeline)
* data plane     -> ``sources`` (DynamoDB-export decode), ``table``
                    (manifest-committed Parquet tables w/ upsert, time
                    travel, vacuum), ``streaming`` (CDC merge)
* query surface  -> ``operators`` (the full relational + LLM-pipeline
                    operator registry, each paired with a DuckDB oracle)

Everything is DataFrame / Spark SQL; Catalyst + AQE plan execution.
"""

from dynamodb_zero_etl_s3tables_spark.engine import ZeroEtlEngine
from dynamodb_zero_etl_s3tables_spark.session import get_spark, tune
from dynamodb_zero_etl_s3tables_spark.spec import TableSpec, SourceSpec

__all__ = ["ZeroEtlEngine", "get_spark", "tune", "TableSpec", "SourceSpec"]
__version__ = "0.1.0"
