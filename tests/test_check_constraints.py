"""Write-time CHECK constraints (Delta invariant / ANSI CHECK
analog, SURVEY.md §2 B5/B9 write-path family): spec.check_constraints
expressions are evaluated by the write job itself (an Observation —
no second pass); any FALSE row aborts the commit before the manifest
references it, leaving no orphan data. NULL results pass (ANSI).
MoR delta layers are exempt; their compaction enforces."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.table.manifest import (
    ConstraintViolationError,
    ManagedTable,
)

SPEC = TableSpec(
    namespace="ns", name="checked", key_columns=("pk",),
    order_columns=("seq",),
    check_constraints=("price >= 0", "status IN ('a', 'b')"),
)


def _rows(spark, *triples):
    return spark.createDataFrame(
        [Row(pk=p, status=s, price=x) for p, s, x in triples]
    )


def _chg(spark, *quads):
    return spark.createDataFrame(
        [
            Row(op="MODIFY", seq=q, pk=p, status=s, price=x)
            for q, p, s, x in quads
        ]
    )


def test_valid_commits_pass(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(_rows(spark, (1, "a", 1.0), (2, "b", 2.0)))
    t.apply_changes(_chg(spark, (1, 1, "b", 3.0)))
    assert t.read().count() == 2


def test_violating_bootstrap_aborts_cleanly(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    with pytest.raises(ConstraintViolationError, match="price >= 0"):
        t.bootstrap(_rows(spark, (1, "a", 1.0), (2, "a", -5.0)))
    assert not t.exists()
    # no orphan data dir survives the abort
    data_root = t.root / "data"
    assert not data_root.exists() or not any(data_root.iterdir())


def test_violating_merge_leaves_table_unchanged(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(_rows(spark, (1, "a", 1.0), (2, "b", 2.0)))
    v = t.version
    with pytest.raises(ConstraintViolationError, match="status IN"):
        t.apply_changes(_chg(spark, (1, 2, "zzz", 2.0)))
    assert t.version == v
    assert sorted(r["status"] for r in t.read().collect()) == ["a", "b"]
    assert t.verify_integrity()["ok"]


def test_error_reports_each_violated_expression(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    with pytest.raises(ConstraintViolationError) as ei:
        t.bootstrap(
            _rows(spark, (1, "zzz", -1.0), (2, "zzz", 2.0), (3, "a", 3.0))
        )
    msg = str(ei.value)
    assert "'price >= 0': 1" in msg and "\"status IN ('a', 'b')\": 2" in msg


def test_null_passes_ansi_semantics(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    df = _rows(spark, (1, "a", 1.0)).unionAll(
        _rows(spark, (2, "b", 0.0)).select(
            "pk", "status", F.lit(None).cast("double").alias("price")
        )
    )
    t.bootstrap(df)  # NULL price -> unknown -> passes
    assert t.read().count() == 2


def test_mor_delta_layer_exempt_compaction_enforces(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(_rows(spark, (1, "a", 1.0), (2, "b", 2.0)))
    # a REMOVE tombstone is not a table row: the MoR layer commits
    t.apply_changes(
        spark.createDataFrame(
            [("REMOVE", 1, 2, None, None)],
            schema="op string, seq bigint, pk bigint, status string, price double",
        ),
        strategy="merge-on-read",
    )
    assert sorted(r["pk"] for r in t.read().collect()) == [1]
    # compaction materializes merged rows and re-enforces: still valid
    t.compact()
    assert sorted(r["pk"] for r in t.read().collect()) == [1]


def test_constraints_roundtrip_reopen(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(_rows(spark, (1, "a", 1.0)))
    t2 = ManagedTable.open(spark, warehouse, "ns.checked")
    assert t2.spec.check_constraints == SPEC.check_constraints
    with pytest.raises(ConstraintViolationError):
        t2.apply_changes(_chg(spark, (1, 1, "a", -9.0)))
