"""Partition-pruned copy-on-write merge tests: a change batch must
rewrite ONLY the partitions it touches; untouched partition dirs
carry forward by reference (same paths), results match a full merge,
time travel stays intact, and vacuum respects shared dirs."""

import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.table.manifest import ManagedTable
from dynamodb_zero_etl_s3tables_spark.table.merge import merge_changes

SPEC = TableSpec(
    namespace="ns",
    name="part_items",
    key_columns=("pk",),
    partition_columns=("shard",),
    order_columns=("seq",),
)


def base_df(spark):
    # shards A (pk 1-3), B (pk 4-6), C (pk 7-9)
    rows = [
        Row(pk=i, shard=s, price=float(i * 10))
        for s, ids in (("A", [1, 2, 3]), ("B", [4, 5, 6]), ("C", [7, 8, 9]))
        for i in ids
    ]
    return spark.createDataFrame(rows)


def changes_df(spark):
    # touch ONLY shard A (update pk=1, delete pk=2) and insert a brand
    # new shard D; shards B and C untouched
    rows = [
        Row(op="MODIFY", seq=1, pk=1, shard="A", price=111.0),
        Row(op="REMOVE", seq=1, pk=2, shard="A", price=0.0),
        Row(op="INSERT", seq=1, pk=10, shard="D", price=100.0),
    ]
    return spark.createDataFrame(rows)


def _entries(t, version=None):
    snap = [s for s in t.history() if version is None or s.version == version][-1]
    return {tuple(e["values"].values()): e["dir"] for e in snap.partitions}


def test_pruned_merge_reuses_untouched_dirs(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    v1 = _entries(t, 1)
    assert set(v1) == {("A",), ("B",), ("C",)}

    t.apply_changes(changes_df(spark), order_cols=("seq",))
    v2 = _entries(t, 2)
    assert set(v2) == {("A",), ("B",), ("C",), ("D",)}
    # untouched shards carry the SAME dirs; touched/new shards get new ones
    assert v2[("B",)] == v1[("B",)]
    assert v2[("C",)] == v1[("C",)]
    assert v2[("A",)] != v1[("A",)]
    # pruned commit wrote only shard A rows (2) + shard D rows (1)
    assert t.history()[-1].row_count == 3


def test_pruned_merge_matches_full_merge(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changes_df(spark), order_cols=("seq",))
    got = {(r["pk"], r["shard"], r["price"]) for r in t.read().collect()}
    expected_df = merge_changes(
        base_df(spark), changes_df(spark), keys=["pk"], order_cols=["seq"]
    )
    expected = {(r["pk"], r["shard"], r["price"]) for r in expected_df.collect()}
    assert got == expected
    assert (1, "A", 111.0) in got and not any(r[0] == 2 for r in got)


def test_time_travel_unaffected_by_pruned_merge(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changes_df(spark), order_cols=("seq",))
    v1_rows = {(r["pk"], r["price"]) for r in t.read(version=1).collect()}
    assert v1_rows == {(i, float(i * 10)) for i in range(1, 10)}


def test_partition_fully_deleted_disappears(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    wipe_b = spark.createDataFrame(
        [Row(op="REMOVE", seq=1, pk=i, shard="B", price=0.0) for i in [4, 5, 6]]
    )
    t.apply_changes(wipe_b, order_cols=("seq",))
    assert set(_entries(t)) == {("A",), ("C",)}
    assert {r["shard"] for r in t.read().collect()} == {"A", "C"}


def test_vacuum_keeps_shared_dirs(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changes_df(spark), order_cols=("seq",))
    # age out v1 from history; v2 still references v1's B/C subdirs,
    # so v1's top-level dir must survive the orphan scan
    res = t.vacuum(
        unreferenced_days=10, noncurrent_days=30, now=time.time() + 40 * 86400
    )
    assert res["snapshots_dropped"] == 1
    assert res["dirs_deleted"] == 0
    got = {(r["pk"], r["shard"]) for r in t.read().collect()}
    assert (5, "B") in got and (8, "C") in got


def test_second_pruned_merge_chains(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changes_df(spark), order_cols=("seq",))
    more = spark.createDataFrame(
        [Row(op="MODIFY", seq=1, pk=7, shard="C", price=777.0)]
    )
    t.apply_changes(more, order_cols=("seq",))
    v3 = _entries(t, 3)
    v2 = _entries(t, 2)
    assert v3[("B",)] == v2[("B",)]
    assert v3[("A",)] == v2[("A",)]  # untouched in merge 2
    assert v3[("C",)] != v2[("C",)]
    rows = {(r["pk"], r["price"]) for r in t.read().collect()}
    assert (7, 777.0) in rows and (1, 111.0) in rows
