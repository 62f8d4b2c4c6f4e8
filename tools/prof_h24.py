"""Phase-level profile of h24 at $SPARK_GRAFT_SF_DIR (r11)."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dynamodb_zero_etl_s3tables_spark.session import get_spark
from dynamodb_zero_etl_s3tables_spark.operators.scratch import scratch_dir
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load
from dynamodb_zero_etl_s3tables_spark.operators.llm_similarity import (
    _DEC, _pq_encode, _pq_seed, _sub_d2, _train_pq_codebook, PQ_M, PQ_SUB,
)
from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.streaming.changelog_files import (
    changelog_file_stream, drain_changelog_files, materialize_changelog,
)
from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="prof_h24")

for it in range(3):
    marks = [("start", time.perf_counter())]

    def mark(name):
        marks.append((name, time.perf_counter()))

    root = scratch_dir(SF_DIR, "h24p_index", wipe=True)
    root.mkdir(parents=True)
    e = load(spark, SF_DIR, "embeddings")
    ten = F.col("vec_id") % 10
    standing = e.filter(ten != 3)
    label_t = dict(e.dtypes)["label"]
    subvecs = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.slice(F.col("embedding"), m * PQ_SUB + 1, PQ_SUB),
    )
    cb_path, cent_path = str(root / "codebook"), str(root / "centroids")
    seed = _pq_seed(standing.select("vec_id", "embedding"), subvecs)
    mark("pq_seed")
    ssub = standing.select("vec_id", F.posexplode(subvecs).alias("m", "svec"))
    _train_pq_codebook(ssub, seed).write.parquet(cb_path)
    mark("train_codebook")
    (
        standing.select("label", F.posexplode("embedding").alias("j", "x"))
        .groupBy("label", "j")
        .agg(F.round(F.sum(F.col("x").cast("double").cast(_DEC)).cast("double") / F.count("*"), 6).alias("c"))
        .groupBy("label")
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("j", "c"))), lambda s: s.getField("c")).alias("cvecfull"))
        .write.parquet(cent_path)
    )
    mark("centroids")
    t = Catalog(spark, str(root / "wh")).create_table(
        TableSpec(namespace="ml", name="vectors", key_columns=("vec_id",))
    )
    t.bootstrap(standing.select("vec_id", "label", "embedding"))
    mark("bootstrap")
    wave1 = e.filter(ten == 3).select(
        F.lit("MODIFY").alias("op"), "vec_id", "label", "embedding",
        F.lit(1).alias("ts"), F.col("vec_id").alias("seq"))
    t.apply_changes(wave1, strategy="merge-on-read")
    mark("wave1")
    wave2 = (
        e.filter(ten == 4).select(
            F.lit("MODIFY").alias("op"), "vec_id", "label",
            F.reverse("embedding").alias("embedding"),
            F.lit(2).alias("ts"), F.col("vec_id").alias("seq"))
        .unionByName(e.filter(ten == 7).select(
            F.lit("REMOVE").alias("op"), "vec_id",
            F.lit(None).cast(label_t).alias("label"),
            F.lit(None).cast("array<float>").alias("embedding"),
            F.lit(2).alias("ts"), F.col("vec_id").alias("seq")))
    )
    t.apply_changes(wave2, strategy="merge-on-read")
    mark("wave2")
    log_dir = str(root / "index_log")
    cb = spark.read.parquet(cb_path).cache()
    cents = spark.read.parquet(cent_path).cache()
    cb.count(), cents.count()
    mark("cache_artifacts")

    def maintain(batch, batch_id):
        if batch.isEmpty():
            return
        ins = batch.filter(F.col("change_op") == "INSERT").select(
            "vec_id", F.col("label").alias("cell"), "embedding",
            F.lit("standing").alias("src"))
        mods = batch.filter(F.col("change_op") == "UPSERT").select("vec_id", "embedding")
        wcell = W.partitionBy("vec_id").orderBy("d2", "label")
        dcell = (
            mods.crossJoin(F.broadcast(cents))
            .withColumn("d2", _sub_d2(F.col("embedding"), F.col("cvecfull")))
            .withColumn("rn", F.row_number().over(wcell))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("label").alias("cell")))
        enc_in = ins.unionByName(
            mods.join(dcell, "vec_id").select(
                "vec_id", "cell", "embedding", F.lit("delta").alias("src")))
        codes = _pq_encode(
            enc_in.select("vec_id", F.posexplode(subvecs).alias("m", "svec")),
            cb, ["vec_id"],
        ).join(enc_in.select("vec_id", "cell", "src"), "vec_id")
        dels = batch.filter(F.col("change_op") == "DELETE").select(
            "vec_id", F.lit(None).cast(label_t).alias("cell"),
            F.lit(None).cast("int").alias("m"), F.lit(None).cast("int").alias("cid"),
            F.lit(None).cast("string").alias("src"))
        (codes.select("vec_id", "cell", "m", "cid", "src")
         .withColumn("alive", F.lit(True))
         .unionByName(dels.withColumn("alive", F.lit(False)))
         .write.mode("overwrite").parquet(f"{log_dir}/batch={batch_id}"))

    manifest = str(root / "wh" / "ml" / "vectors" / "manifest.json")
    stage = str(root / "cl_stage")
    materialize_changelog(t, stage)
    mark("materialize")
    stream = changelog_file_stream(spark, manifest, stage)
    n = drain_changelog_files(stream, str(root / "unused"), str(root / "ckpt"),
                              foreach_batch=maintain)
    mark(f"drain({n}b)")
    cb.unpersist(); cents.unpersist()
    log = spark.read.parquet(log_dir)
    latest = log.withColumn("maxb", F.max("batch").over(W.partitionBy("vec_id"))).filter(
        F.col("batch") == F.col("maxb"))
    latest.filter(F.col("alive")).select("vec_id", "cell", "m", "cid", "src").write.format(
        "noop").mode("overwrite").save()
    mark("final_noop")
    out = []
    for (n1, t1), (n2, t2) in zip(marks, marks[1:]):
        out.append(f"{n2} {t2-t1:.2f}")
    print(f"iter{it}: " + "  ".join(out) + f"  TOTAL {marks[-1][1]-marks[0][1]:.2f}")
