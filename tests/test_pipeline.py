"""Pipeline orchestration tests (A5 ordering, A10 idempotent re-run,
§3.3 end-to-end lifecycle)."""

import pytest
from pyspark.sql import Row

from dynamodb_zero_etl_s3tables_spark.plans.pipeline import Pipeline, Stage
from dynamodb_zero_etl_s3tables_spark.spec import SourceSpec, TableSpec
from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog


def test_topological_order():
    p = Pipeline()
    p.add(Stage("c", lambda ctx: None, ("b",)))
    p.add(Stage("a", lambda ctx: None))
    p.add(Stage("b", lambda ctx: None, ("a",)))
    assert p.order() == ["a", "b", "c"]


def test_duplicate_stage_rejected():
    p = Pipeline().add(Stage("a", lambda ctx: None))
    with pytest.raises(ValueError, match="duplicate stage"):
        p.add(Stage("a", lambda ctx: None))


def test_zero_etl_end_to_end(spark, warehouse):
    cat = Catalog(spark, warehouse)
    source = SourceSpec(table_name="orders", key_columns=("pk",))
    target = TableSpec(
        namespace="ns", name="orders_rep", key_columns=("pk",), order_columns=("seq",)
    )

    def snapshot(s):
        return s.createDataFrame([Row(pk=i, v=f"v{i}") for i in range(3)])

    def batch(s):
        return s.createDataFrame(
            [
                Row(op="MODIFY", seq=1, pk=0, v="updated"),
                Row(op="REMOVE", seq=1, pk=1, v=None),
                Row(op="INSERT", seq=1, pk=5, v="v5"),
            ]
        )

    p = Pipeline.zero_etl(spark, cat, source, target, snapshot, [batch])
    ctx = p.run()
    assert ctx["register_view"] == "ns_orders_rep"
    state = {r.pk: r.v for r in cat.sql("SELECT * FROM ns_orders_rep").collect()}
    assert state == {0: "updated", 2: "v2", 5: "v5"}
    assert set(p.metrics) == {
        "validate", "create_namespace", "bootstrap", "merge_0", "register_view",
    }

    # A10: full pipeline re-run converges (bootstrap skipped, merge idempotent)
    p2 = Pipeline.zero_etl(spark, cat, source, target, snapshot, [batch])
    p2.run()
    state2 = {r.pk: r.v for r in cat.sql("SELECT * FROM ns_orders_rep").collect()}
    assert state2 == state


def test_pipeline_validation_blocks_run(spark, warehouse):
    cat = Catalog(spark, warehouse)
    bad_source = SourceSpec(table_name=None, key_columns=("pk",))
    target = TableSpec(namespace="ns", name="t", key_columns=("pk",))
    p = Pipeline.zero_etl(
        spark, cat, bad_source, target, lambda s: s.range(1), []
    )
    with pytest.raises(ValueError, match="explicit tableName"):
        p.run()
