"""Decompose the CoW commit floor: time the pieces of apply_changes /
_write_snapshot on an h26-shaped table at $SPARK_GRAFT_SF_DIR."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.session import get_spark
from dynamodb_zero_etl_s3tables_spark.operators.scratch import scratch_dir
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load
from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog
from dynamodb_zero_etl_s3tables_spark.table import manifest as M

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="prof_commit")

# instrument the module-level pieces
TIMES = {}


def wrap(obj, name, label):
    orig = getattr(obj, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        TIMES[label] = TIMES.get(label, 0.0) + time.perf_counter() - t0
        return r

    setattr(obj, name, timed)


wrap(M, "_collect_file_stats", "collect_file_stats")
wrap(M.ManagedTable, "_read_manifest", "read_manifest")
wrap(M.ManagedTable, "_write_manifest", "write_manifest")
wrap(M.ManagedTable, "_fill_generated", "fill_generated")

base_full = load(spark, SF_DIR, "orders").select(
    F.col("o_orderkey").alias("pk"),
    F.col("o_orderstatus").alias("status"),
    F.col("o_totalprice").alias("price"),
)

for it in range(3):
    TIMES.clear()
    root = scratch_dir(SF_DIR, "prof_commit", wipe=True)
    root.mkdir(parents=True)
    t = Catalog(spark, str(root / "wh")).create_table(
        TableSpec(namespace="ns", name="o", key_columns=("pk",))
    )
    t0 = time.perf_counter()
    t.bootstrap(base_full.filter(F.col("pk") % 3 == 0))
    t1 = time.perf_counter()
    wave = base_full.filter(F.col("pk") % 6 == 3).select(
        F.lit("MODIFY").alias("op"), "pk", "status",
        (F.col("price") * 2).alias("price"),
        F.lit(1).alias("ts"), F.col("pk").alias("seq"))
    t.apply_changes(wave)
    t2 = time.perf_counter()
    print(f"iter{it}: bootstrap {t1-t0:.2f} merge {t2-t1:.2f} | "
          + "  ".join(f"{k} {v:.3f}" for k, v in sorted(TIMES.items())))
