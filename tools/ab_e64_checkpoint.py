"""Cold A/B of e64's (now-removed) eager localCheckpoint, at
$SPARK_GRAFT_CPUS cores. argv[1] = "ckpt" (r10 shape — monkeypatched
back in) is no longer reproducible post-revert; "nockpt" runs the
current code. Measured r11 (fresh process per variant, alternated):

    8 cores  cold: ckpt 13.55 / 14.11 s   nockpt 14.33 / 13.94 s
    32 cores cold: ckpt 15.40 s           nockpt 14.03 s
    warm: overlapping both ways (3.6-4.3 s @8c, 4.5-5.0 s @32c)

No cold or low-core benefit -> checkpoint reverted (VERDICT r10 #6).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant = sys.argv[1] if len(sys.argv) > 1 else "nockpt"
if variant == "ckpt":
    # re-pin the two side frames the way r10 did, for re-measurement
    from pyspark.sql import DataFrame

    _orig = DataFrame.groupBy

    def _pin(self, *a, **kw):
        return _orig(self, *a, **kw)

    print("note: 'ckpt' now only labels the run; the checkpoint was "
          "removed from the query — patch llm_similarity locally to "
          "re-measure the old shape")

from dynamodb_zero_etl_s3tables_spark.session import get_spark
from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY

spark = get_spark(app_name=f"e64_{variant}")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
t0 = time.perf_counter()
QUERY_REGISTRY["e64_knn_pagerank"].build(spark, SF).write.format("noop").mode(
    "overwrite"
).save()
t1 = time.perf_counter()
QUERY_REGISTRY["e64_knn_pagerank"].build(spark, SF).write.format("noop").mode(
    "overwrite"
).save()
t2 = time.perf_counter()
print(
    f"{variant} cpus={os.environ.get('SPARK_GRAFT_CPUS')}: "
    f"cold {t1 - t0:.2f} warm {t2 - t1:.2f}"
)
