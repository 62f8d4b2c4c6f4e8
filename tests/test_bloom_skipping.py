"""Per-file bloom-filter skipping (Iceberg Puffin blob analog,
SURVEY.md §2 B12 scan-pruning family): equality predicates prune
files whose bloom proves the value absent, even where min/max ranges
fully overlap (the high-cardinality point-lookup case sort_columns
can't help). Absence of a bloom — other ops, float columns, legacy
snapshots — falls back to min/max-only behavior, so scan results are
always exactly the residual filter."""

from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.table.manifest import (
    ManagedTable,
    _bloom_build,
    _bloom_may_match,
)


def _interleaved_df(spark, n=8000):
    # hash-repartition by pk: each key lives in exactly ONE of two
    # files while both files span the full [0, 2n) key range — so
    # min/max can never skip a file, only the bloom can. murmur3 is
    # deterministic, so the layout (and the pruning counts the tests
    # assert) is stable across runs and hosts.
    return (
        spark.range(0, n)
        .select(
            (F.col("id") * 2 + (F.col("id") % 2)).alias("pk"),
            (F.col("id") % 2).alias("parity"),
            F.concat(
                F.lit("k"), (F.col("id") * 2 + (F.col("id") % 2))
            ).alias("tag"),
            (F.col("id") * 0.5).alias("x"),
        )
        .repartition(2, "pk")
    )


def _bloom_table(spark, warehouse, name, bloom_columns):
    spec = TableSpec(
        namespace="ns", name=name, key_columns=("pk",),
        bloom_columns=bloom_columns,
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(_interleaved_df(spark))
    return t


def test_bloom_prunes_where_minmax_cannot(spark, warehouse):
    t = _bloom_table(spark, warehouse, "bloomed", ("pk",))
    out = t.scan([("pk", "=", 4)])  # even key -> lives in one file
    assert [r["pk"] for r in out.collect()] == [4]
    m = t.last_scan_metrics
    assert m["files_total"] == 2 and m["files_read"] == 1, m


def test_string_bloom_prunes(spark, warehouse):
    t = _bloom_table(spark, warehouse, "bloomstr", ("tag",))
    out = t.scan([("tag", "=", "k7")])  # odd key -> other file
    assert [r["pk"] for r in out.collect()] == [7]
    m = t.last_scan_metrics
    assert m["files_total"] == 2 and m["files_read"] == 1, m


def test_no_false_negatives_many_point_lookups(spark, warehouse):
    t = _bloom_table(spark, warehouse, "bloomexact", ("pk", "tag"))
    # pk = 2*id + id%2 lands on 0 or 3 (mod 4) only
    for k in (0, 3, 4, 7, 1000, 9999, 15996, 15999):
        got = t.scan([("pk", "=", k)]).count()
        assert got == 1, f"pk={k}: {got}"
    # absent keys return empty (possibly without touching any file)
    assert t.scan([("pk", "=", 16001)]).count() == 0


def test_non_equality_ops_bypass_bloom(spark, warehouse):
    t = _bloom_table(spark, warehouse, "bloomrange", ("pk",))
    want = t.read().filter(F.col("pk") >= 15990).count()
    assert want > 0
    assert t.scan([("pk", ">=", 15990)]).count() == want


def test_without_bloom_columns_no_pruning(spark, warehouse):
    t = _bloom_table(spark, warehouse, "nobloom", ())
    t.scan([("pk", "=", 4)])
    m = t.last_scan_metrics
    assert m["files_total"] == 2 and m["files_read"] == 2, m


def test_float_column_excluded_from_bloom(spark, warehouse):
    # doubles are un-keyable: no bloom is recorded, scan still exact
    t = _bloom_table(spark, warehouse, "bloomfloat", ("x",))
    snap = t._read_manifest().current
    assert all("bloom" not in e for e in snap.files)
    assert t.scan([("x", "=", 1.0)]).count() == 1


def test_bloom_inside_partitions(spark, warehouse):
    spec = TableSpec(
        namespace="ns", name="bloompart", key_columns=("pk",),
        partition_columns=("parity",), bloom_columns=("pk",),
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(_interleaved_df(spark).repartition(4))
    out = t.scan([("parity", "=", 0), ("pk", "=", 4)])
    assert [r["pk"] for r in out.collect()] == [4]
    m = t.last_scan_metrics
    assert m["partitions_read"] == 1
    assert m["files_read"] < m["files_total"], m


def test_bloom_survives_compaction(spark, warehouse):
    t = _bloom_table(spark, warehouse, "bloomcompact", ("pk",))
    t.compact(target_file_bytes=16 * 1024)
    out = t.scan([("pk", "=", 4)])
    assert [r["pk"] for r in out.collect()] == [4]
    m = t.last_scan_metrics
    assert m["files_read"] < m["files_total"], m


def test_bloom_unit_membership_and_exclusion():
    b = _bloom_build(list(range(0, 1000, 2)))
    assert b is not None
    # no false negatives, ever
    assert all(_bloom_may_match({"pk": b}, "pk", "=", v) for v in range(0, 1000, 2))
    # fpp sanity: the overwhelming majority of absent keys are excluded
    misses = sum(
        not _bloom_may_match({"pk": b}, "pk", "=", v) for v in range(1, 1000, 2)
    )
    assert misses > 450, misses
    # un-keyable values and foreign ops always pass
    assert _bloom_may_match({"pk": b}, "pk", "=", 1.5)
    assert _bloom_may_match({"pk": b}, "pk", ">=", 3)
    assert _bloom_may_match({"pk": b}, "other", "=", 3)
    # mixed-type column refuses to build (partial bloom would lie)
    assert _bloom_build([1, 2.5, 3]) is None
    # int and string keys don't collide by formatting
    bs = _bloom_build(["5"])
    assert _bloom_may_match({"c": bs}, "c", "=", "5")
