"""Same-session A/B: Python-DataSource changelog drain vs the r11
JVM staged-file drain, on the h26 CoW fixture at $SPARK_GRAFT_SF_DIR.

Checks row equivalence (sorted collect) AND times each phase.
"""
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
from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
    drain_changelog,
    make_changelog_source,
)
from dynamodb_zero_etl_s3tables_spark.streaming.changelog_files import (
    changelog_file_stream,
    drain_changelog_files,
    materialize_changelog,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab_changelog")


def build_table(root):
    t = Catalog(spark, str(root / "wh")).create_table(
        TableSpec(namespace="ns", name="orders_cow", key_columns=("pk",))
    )
    base = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    t.bootstrap(base.filter(F.col("pk") % 3 == 0))
    wave1 = (
        base.filter(F.col("pk") % 3 == 1)
        .select(F.lit("MODIFY").alias("op"), "pk", "status", "price",
                F.lit(1).alias("ts"), F.col("pk").alias("seq"))
        .unionByName(base.filter(F.col("pk") % 6 == 3).select(
            F.lit("MODIFY").alias("op"), "pk", "status",
            (F.col("price") * 2).alias("price"),
            F.lit(1).alias("ts"), F.col("pk").alias("seq")))
        .unionByName(base.filter(F.col("pk") % 6 == 0).select(
            F.lit("REMOVE").alias("op"), "pk",
            F.lit(None).cast("string").alias("status"),
            F.lit(None).cast("double").alias("price"),
            F.lit(1).alias("ts"), F.col("pk").alias("seq")))
    )
    t.apply_changes(wave1)
    t.compact()
    wave2 = base.filter(F.col("pk") % 3 == 2).select(
        F.lit("MODIFY").alias("op"), "pk", "status",
        (F.col("price") * 3).alias("price"),
        F.lit(2).alias("ts"), F.col("pk").alias("seq"))
    return t, wave2


def run_python_source(tag):
    root = scratch_dir(SF_DIR, f"ab_cl_py_{tag}", wipe=True)
    root.mkdir(parents=True)
    t0 = time.perf_counter()
    t, wave2 = build_table(root)
    t1 = time.perf_counter()
    manifest = str(root / "wh" / "ns" / "orders_cow" / "manifest.json")
    spark.dataSource.register(make_changelog_source())
    stream = (spark.readStream.format("table_changelog")
              .option("manifest", manifest).option("keys", "pk").load())
    drain_changelog(stream, str(root / "out"), str(root / "ckpt"), manifest)
    t2 = time.perf_counter()
    t.apply_changes(wave2)
    t3 = time.perf_counter()
    drain_changelog(stream, str(root / "out"), str(root / "ckpt"), manifest)
    t4 = time.perf_counter()
    rows = sorted(map(tuple, spark.read.parquet(str(root / "out")).collect()))
    print(f"py   {tag}: build {t1-t0:.2f} drain1 {t2-t1:.2f} "
          f"commit {t3-t2:.2f} drain2 {t4-t3:.2f} total {t4-t0:.2f} "
          f"rows {len(rows)}")
    return rows


def run_staged(tag):
    root = scratch_dir(SF_DIR, f"ab_cl_jvm_{tag}", wipe=True)
    root.mkdir(parents=True)
    t0 = time.perf_counter()
    t, wave2 = build_table(root)
    t1 = time.perf_counter()
    manifest = str(root / "wh" / "ns" / "orders_cow" / "manifest.json")
    stage = str(root / "cl_stage")

    def drain():
        materialize_changelog(t, stage)
        stream = changelog_file_stream(spark, manifest, stage)
        return drain_changelog_files(
            stream, str(root / "out"), str(root / "ckpt"))

    tm0 = time.perf_counter()
    materialize_changelog(t, stage)
    tm1 = time.perf_counter()
    stream = changelog_file_stream(spark, manifest, stage)
    n1 = drain_changelog_files(stream, str(root / "out"), str(root / "ckpt"))
    t2 = time.perf_counter()
    t.apply_changes(wave2)
    t3 = time.perf_counter()
    n2 = drain()
    t4 = time.perf_counter()
    rows = sorted(map(tuple, spark.read.parquet(str(root / "out")).collect()))
    print(f"jvm  {tag}: build {t1-t0:.2f} mat1 {tm1-tm0:.2f} "
          f"drain1 {t2-tm1:.2f}({n1}b) commit {t3-t2:.2f} "
          f"drain2 {t4-t3:.2f}({n2}b) total {t4-t0:.2f} rows {len(rows)}")
    return rows


# warm + interleave
r_py = run_python_source("w")
r_jvm = run_staged("w")
assert r_py == r_jvm, (
    f"MISMATCH: {len(r_py)} vs {len(r_jvm)}; "
    f"first diff: {next(((a, b) for a, b in zip(r_py, r_jvm) if a != b), None)}"
)
print("EQUIVALENT:", len(r_py), "rows")
for i in range(2):
    run_python_source(i)
    run_staged(i)
