"""Loaders for the driver-generated benchmark tables (TESTDATA.md).

These are plain Parquet scans (SURVEY.md D1): Catalyst pushes filters
and prunes columns into the scan, so callers should select/filter on
the returned DataFrame rather than materializing it.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)



def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one testdata table (lazy; pushdown-friendly).

    Timestamp handling covers both testdata generations:
    - TIMESTAMP(NANOS) parquet (round-1 data) reads only as LONG
      nanoseconds (``nanosAsLong``, set in session.RUNTIME_CONF) and
      is converted here to a microsecond TIMESTAMP — matching
      DuckDB's own micro-truncating scan of the same file.
    - plain timestamp[us] parquet (current data) reads natively as
      TIMESTAMP_NTZ and passes through untouched; operators are
      NTZ-safe (timestamp_diff for gaps, cast-through-TIMESTAMP for
      epoch math, cast before watermarks).
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
