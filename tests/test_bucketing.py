"""E7 bucketing: two tables bucketed on the join key join WITHOUT a
shuffle — the co-location strategy for repeated big-big joins at
scale (bucket once, join many times). The plan assertion is the
point: no Exchange feeds the join when bucket layouts match."""

import pytest
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load(spark, SF_DIR, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).option("path", str(wh / "b_orders")).mode("overwrite").saveAsTable("b_orders")
    load(spark, SF_DIR, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).option("path", str(wh / "b_lineitem")).mode("overwrite").saveAsTable("b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # hint forces sort-merge (the tiny test tables would broadcast
    # otherwise); at real scale SMJ is what a big-big join plans to
    l = spark.table("b_lineitem").hint("merge")
    o = spark.table("b_orders")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
        F.count("*").alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join consumes bucketed scans directly: the only Exchange in
    # the plan belongs to the aggregate, never to a join input
    join_part = plan.split("SortMergeJoin")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, join_part[:2000]


def test_bucketed_join_matches_unbucketed(spark, bucketed):
    l = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    expected = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
