"""Physical-plan shape tests (SURVEY.md §4.2, E7): the scale posture
is part of the contract, not an accident. Each assertion pins a plan
property that would silently regress otherwise — filter pushdown into
the parquet scan, column pruning, broadcast of dimension tables,
distributed top-k, hash (not sort) aggregation, and the absence of
cartesian products in pair-generating operators."""

import pytest

from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERY_REGISTRY[name].build(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_d01_scan_pushdown_and_pruning(spark):
    plan = plan_of(spark, "d01_parquet_scan")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # projection reaches the reader: only the 4 referenced columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint" in plan
    assert "l_comment" not in plan


def test_d21_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "d21_star_join_flagship")
    assert plan.count("BroadcastHashJoin") >= 2  # nation, region
    assert "CartesianProduct" not in plan
    # the shipdate range filter is pushed into the lineitem scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_d16_broadcast_star(spark):
    plan = plan_of(spark, "d16_join_broadcast_star")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_d22_agg_is_hash_not_sort(spark):
    plan = plan_of(spark, "d22_grouped_agg_q1")
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_e02_signature_agg_is_hash(spark):
    # BIGINT minhash components keep the min-agg hashable; a string
    # signature would silently fall back to SortAggregate
    plan = plan_of(spark, "e02_minhash_signatures")
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_e02b_lsh_has_no_join_at_all(spark):
    # bucket-group + in-bucket expansion: no self-join, no cartesian
    plan = plan_of(spark, "e02b_minhash_lsh_pairs")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan


def test_e03_topk_is_distributed(spark):
    plan = plan_of(spark, "e03_cosine_topk")
    assert "TakeOrderedAndProject" in plan


def test_d37_topk_is_take_ordered(spark):
    plan = plan_of(spark, "d37_top_k")
    assert "TakeOrderedAndProject" in plan


def test_e04_pairs_ride_equi_join(spark):
    plan = plan_of(spark, "e04_similarity_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d19_range_join_is_hash_on_equi_key(spark):
    plan = plan_of(spark, "d19_range_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name",
    ["b05_cdc_upsert_merge", "d20_asof_join", "e05_tfidf", "e02e_embedding_neardup"],
)
def test_no_cartesian_anywhere(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name)
