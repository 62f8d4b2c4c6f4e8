"""Min-of-3 noop-sink timings for a subset of registry queries at
$SPARK_GRAFT_SF_DIR — the bench's per-query methodology, standalone.

Usage: python tools/time_queries.py q1 [q2 ...]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dynamodb_zero_etl_s3tables_spark.session import get_spark
from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="time_queries")
QUERY_REGISTRY["d01_parquet_scan"].build(spark, SF_DIR).write.format(
    "noop"
).mode("overwrite").save()
for name in sys.argv[1:]:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        QUERY_REGISTRY[name].build(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        runs.append(time.perf_counter() - t0)
    print(f"{name:40s} min {min(runs):6.2f}  runs {[round(r,2) for r in runs]}")
