"""Generated columns (Delta generated-columns analog, TableSpec.
generated_columns): omitted columns are computed at write time from
their SQL expression; supplied columns are validated row-by-row with
a null-safe <=> write-observation constraint; the spec round-trips
through the persisted manifest."""

import pytest
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog
from dynamodb_zero_etl_s3tables_spark.table.manifest import (
    ConstraintViolationError,
    ManagedTable,
)

SPEC = dict(
    namespace="ns",
    name="gen_tbl",
    key_columns=("pk",),
    generated_columns=(
        ("price_cents", "CAST(ROUND(price * 100) AS BIGINT)"),
        # later expressions may reference earlier generated columns
        ("is_big", "price_cents >= 100000"),
    ),
)


def _table(spark, warehouse, **over):
    return Catalog(spark, warehouse).create_table(TableSpec(**{**SPEC, **over}))


def test_omitted_generated_columns_are_computed(spark, warehouse):
    t = _table(spark, warehouse)
    t.bootstrap(spark.createDataFrame([(1, 12.34), (2, 1500.0)], "pk long, price double"))
    got = {r["pk"]: (r["price_cents"], r["is_big"]) for r in t.read().collect()}
    assert got == {1: (1234, False), 2: (150000, True)}


def test_supplied_matching_values_commit(spark, warehouse):
    t = _table(spark, warehouse)
    t.bootstrap(
        spark.createDataFrame(
            [(1, 2.0, 200, False)], "pk long, price double, price_cents long, is_big boolean"
        )
    )
    assert t.read().collect()[0]["price_cents"] == 200


def test_supplied_mismatch_aborts_commit(spark, warehouse):
    t = _table(spark, warehouse)
    t.bootstrap(spark.createDataFrame([(1, 2.0)], "pk long, price double"))
    v = t.version
    with pytest.raises(ConstraintViolationError):
        t.apply_changes(
            spark.createDataFrame(
                [("MODIFY", 2, 3.0, 999, False, 1, 1)],
                "op string, pk long, price double, price_cents long, "
                "is_big boolean, ts long, seq long",
            )
        )
    assert t.version == v  # nothing committed
    assert t.read().count() == 1


def test_cdc_batch_without_generated_columns_merges(spark, warehouse):
    t = _table(spark, warehouse)
    t.bootstrap(spark.createDataFrame([(1, 2.0)], "pk long, price double"))
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 1, 2000.0, 1, 1), ("MODIFY", 2, 5.0, 1, 2)],
            "op string, pk long, price double, ts long, seq long",
        )
    )
    got = {r["pk"]: (r["price_cents"], r["is_big"]) for r in t.read().collect()}
    assert got == {1: (200000, True), 2: (500, False)}


def test_mor_images_carry_generated_values_and_compact_enforces(spark, warehouse):
    t = _table(spark, warehouse)
    t.bootstrap(spark.createDataFrame([(1, 2.0)], "pk long, price double"))
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 2, 10.0, 1, 1), ("REMOVE", 1, None, 1, 2)],
            "op string, pk long, price double, ts long, seq long",
        ),
        strategy="merge-on-read",
    )
    got = {r["pk"]: r["price_cents"] for r in t.read().collect()}
    assert got == {2: 1000}
    t.compact()
    assert {r["pk"]: r["price_cents"] for r in t.read().collect()} == {2: 1000}


def test_generated_spec_roundtrips_through_manifest(spark, warehouse):
    t = _table(spark, warehouse)
    t.bootstrap(spark.createDataFrame([(1, 2.0)], "pk long, price double"))
    reopened = ManagedTable.open(spark, warehouse, "ns.gen_tbl")
    assert reopened.spec.generated_columns == SPEC["generated_columns"]
    # and the reopened handle still computes omitted columns
    reopened.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 3, 4.0, 1, 1)], "op string, pk long, price double, ts long, seq long"
        ),
        order_cols=("ts", "seq"),
    )
    assert (
        reopened.read().filter(F.col("pk") == 3).collect()[0]["price_cents"] == 400
    )
