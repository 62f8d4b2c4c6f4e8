"""Z-order layout tests: Morton-code correctness and the multi-dim
pruning win it exists for (SURVEY §4.1 file-skipping; E7 posture)."""

from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.functions.zorder import (
    interleave_bits,
    scale_to_bits,
    zorder_key,
)
from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.table.manifest import ManagedTable


def test_interleave_known_values(spark):
    # x=0b11, y=0b01 -> bits land x:pos0,2  y:pos1,3 -> 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    out = df.select(interleave_bits(F.col("x"), F.col("y"), bits=2).alias("z"))
    assert out.first().z == 7
    # order matters: swapping dims swaps bit positions
    out2 = df.select(interleave_bits(F.col("y"), F.col("x"), bits=2).alias("z"))
    assert out2.first().z == 11  # y:pos0,2 (1,0) x:pos1,3 (1,1) -> 0b1011


def test_interleave_is_injective_on_grid(spark):
    n = 32
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    z = grid.select(interleave_bits(F.col("x"), F.col("y"), bits=5).alias("z"))
    assert z.distinct().count() == n * n


def test_scale_to_bits_clamps(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double")
    out = [r.s for r in df.select(scale_to_bits(F.col("v"), 0, 100, bits=8).alias("s")).collect()]
    assert out[0] == 0 and out[1] == 0 and out[3] == 255 and out[4] == 255
    assert 0 < out[2] < 255


def test_zorder_layout_prunes_both_dims(spark, warehouse):
    # independent uniform x,y; box query over both dims
    n = 1 << 8
    df = spark.range(n * n).select(
        F.col("id").alias("pk"),
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    box = [("x", ">=", 10), ("x", "<", 40), ("y", ">=", 10), ("y", "<", 40)]

    tx = ManagedTable(
        spark, warehouse,
        TableSpec(namespace="ns", name="xsort", key_columns=("pk",),
                  sort_columns=("x",), properties={"write.sorted-file-count": 16}),
    )
    tx.bootstrap(df)
    assert tx.scan(box).count() == 30 * 30
    x_read = tx.last_scan_metrics["files_read"]

    zdf = df.withColumn(
        "zval", zorder_key([(F.col("x"), 0, n - 1), (F.col("y"), 0, n - 1)], bits=8)
    )
    tz = ManagedTable(
        spark, warehouse,
        TableSpec(namespace="ns", name="zsort", key_columns=("pk",),
                  sort_columns=("zval",), properties={"write.sorted-file-count": 16}),
    )
    tz.bootstrap(zdf)
    assert tz.scan(box).count() == 30 * 30  # exactness unaffected by layout
    z_read = tz.last_scan_metrics["files_read"]

    # x-sorted layout prunes on x only (~4/16 files); the y constraint
    # prunes nothing there. z-order tightens BOTH dims per file.
    assert z_read < x_read, (z_read, x_read)


# ---------------------------------------------------------------------------
# compact(zorder_by=...): Delta OPTIMIZE ZORDER BY analog on ManagedTable
# ---------------------------------------------------------------------------


def test_compact_zorder_preserves_rows_and_prunes_box(spark, tmp_path):
    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.manifest import ManagedTable

    t = ManagedTable(
        spark,
        str(tmp_path / "wh"),
        TableSpec(namespace="ns", name="zc", key_columns=("pk",)),
    )
    # x and y scattered across 16 files: every file spans both ranges
    df = spark.range(0, 40000).select(
        F.col("id").alias("pk"),
        (F.col("id") % 200).cast("double").alias("x"),
        ((F.col("id") * 7) % 200).cast("double").alias("y"),
    )
    t.bootstrap(df.repartition(16, "pk"))
    before = sorted(map(tuple, t.read().collect()))
    box = [("x", "<", 25.0), ("x", ">=", 0.0), ("y", "<", 25.0), ("y", ">=", 0.0)]
    t.scan(box)
    m0 = t.last_scan_metrics
    assert m0["files_read"] == m0["files_total"]  # scattered: no pruning
    r = t.compact(target_file_bytes=64 * 1024, zorder_by=("x", "y"))
    assert r["files_after"] >= 4  # multiple files or there is nothing to prune
    assert sorted(map(tuple, t.read().collect())) == before
    out = t.scan(box)
    m1 = t.last_scan_metrics
    assert m1["files_read"] < m1["files_total"], m1
    want = [r0 for r0 in before if r0[1] < 25.0 and r0[2] < 25.0]
    assert sorted(map(tuple, out.collect())) == want


def test_compact_zorder_bounds_from_manifest_stats(spark, tmp_path):
    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.manifest import ManagedTable

    t = ManagedTable(
        spark,
        str(tmp_path / "wh"),
        TableSpec(namespace="ns", name="zb", key_columns=("pk",)),
    )
    t.bootstrap(
        spark.range(0, 1000).select(
            F.col("id").alias("pk"),
            (F.col("id") % 50).cast("double").alias("x"),
            (F.col("id") % 7).cast("double").alias("y"),
        )
    )
    snap = t._read_manifest().current
    assert t._stats_bounds(snap, "x") == (0.0, 49.0)
    assert t._stats_bounds(snap, "y") == (0.0, 6.0)
    assert t._stats_bounds(snap, "nope") is None


def test_scale_to_bits_null_lands_at_zero(spark):
    """r8 review: Spark's least/greatest SKIP null arguments, so a
    NULL value silently rode the clamp into the grid MAX corner —
    polluting the max-corner files' min/max stats. NULLs now land at
    grid 0 (the NULLS FIRST convention)."""
    from dynamodb_zero_etl_s3tables_spark.functions.zorder import scale_to_bits

    df = spark.createDataFrame([(None,), (0.0,), (100.0,)], "x double")
    got = [
        r.g
        for r in df.select(
            scale_to_bits(F.col("x"), 0.0, 100.0, bits=4).alias("g")
        ).collect()
    ]
    assert got == [0, 0, 15]
