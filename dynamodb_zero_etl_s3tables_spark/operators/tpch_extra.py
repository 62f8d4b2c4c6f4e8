"""TPC-H query shapes, second tranche (public TPC-H spec, adapted to
the reduced testdata columns): Q4 (EXISTS semi-join aggregate), Q12
(conditional agg over a join), Q14 (promo revenue ratio), Q19
(disjunctive OR-of-ANDs join predicates), Q21 (EXISTS + NOT EXISTS
correlated pair), Q22 (scalar subquery + anti-join). Together with
Q1/Q3/Q5/Q10/Q18 (aggregates.py / analytics.py) these cover every
distinct join/subquery shape in the TPC-H suite expressible over the
available tables (no partsupp in testdata, so Q2/Q11/Q16/Q20 are out
of reach; their shapes — correlated min, NOT IN — appear in d61).

The testdata lacks l_commitdate/l_receiptdate/l_shipmode/p_container,
so each query keeps the REFERENCE SHAPE (the join/subquery structure
Catalyst must plan) with predicates re-targeted at existing columns;
docstrings note each substitution.

Scale posture: every EXISTS/NOT EXISTS compiles to a hash semi/anti
join keyed on the equi part (orderkey/custkey) with the inequality as
a residual — never a nested-loop; scalar subqueries broadcast a 1-row
result. Verified in tests/test_plans.py's registry sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.operators.registry import (
    DAVG,
    DSUM,
    davg,
    dsum,
    query,
)
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load


@query(
    "d67_tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def d67_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (public spec): order-priority checking — count
    orders in one quarter having at least one late lineitem. The spec's
    l_commitdate < l_receiptdate lateness test becomes "shipped >60
    days after order date" (those columns don't exist here); the shape
    under test is the correlated EXISTS, which must compile to a hash
    LEFT SEMI join on l_orderkey with the date comparison as a
    residual condition — one shuffle, no de-dup of lineitem needed
    (semi joins emit each order at most once)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "d68_tpch_q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def d68_tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (public spec): shipping-mode priority split —
    per category, how many lineitems belong to high- vs low-priority
    orders. l_shipmode doesn't exist in the testdata, so the grouping
    category is l_linestatus; the shape is the year-windowed
    fact-to-fact join feeding two conditional counts (map-side partial
    aggregation collapses each group before the single exchange)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "d69_tpch_q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * {DSUM("CASE WHEN p_type = 'PROMO' "
                          "THEN l_extendedprice * (1 - l_discount) "
                          "ELSE 0 END")}
                  / {DSUM('l_extendedprice * (1 - l_discount)')}
           AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1998-03-01'
      AND l_shipdate <  TIMESTAMP '1998-04-01'
    """,
)
def d69_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (public spec): promotion-revenue percentage for one
    month (testdata p_type is a plain category, so the predicate is
    equality on 'PROMO' rather than LIKE 'PROMO%'). Part broadcasts
    (it's the dimension side); both sums ride one partial-aggregated
    scan; the division happens on the final 1-row result. Both
    operands are decimal-exact sums cast to DOUBLE, so the IEEE
    division is bit-identical across engines — no ROUND (FIXTURES.md
    rule: never round a value both engines already compute
    bit-identically)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * dsum(promo) / dsum(rev))
            .alias("promo_revenue_pct")
        )
    )


@query(
    "d70_tpch_q19_disjunctive_join",
    oracle=f"""
    SELECT {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ( (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity >= 1 AND l_quantity <= 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity >= 10 AND l_quantity <= 20)
         OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
             AND l_quantity >= 20 AND l_quantity <= 30) )
    """,
)
def d70_tpch_q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (public spec): discounted revenue under an
    OR-of-ANDs join predicate (p_container/l_shipmode clauses dropped
    — columns absent — keeping brand/size/quantity bands). The planner
    point: the disjunction stays a RESIDUAL on the p_partkey equi-join
    (broadcast hash join, no nested loop), and Catalyst extracts the
    common `p_brand IN (...)` / size bounds to prune the broadcast
    side before the join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return j.filter(band).agg(
        dsum(rev).alias("revenue"), F.count("*").alias("n_lines")
    )


@query(
    "d71_tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def d71_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (public spec): suppliers who kept multi-supplier
    orders waiting — the only TPC-H query with BOTH a correlated
    EXISTS and a correlated NOT EXISTS against the same fact table.
    The spec's receipt-vs-commit lateness becomes "shipped last"
    (l_shipdate is the only lateness signal here). Both subqueries
    compile to hash semi/anti joins keyed on l_orderkey with the
    suppkey/shipdate inequalities as residuals, so the whole query is
    three shuffles of lineitem on one key plus a broadcast of
    supplier — no quadratic pair expansion."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l1 = li.alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    ).alias("l3")
    waiting = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("k2"))
            & (F.col("s2") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("k3"))
            & (F.col("s3") != F.col("l1.l_suppkey"))
            & (F.col("d3") > F.col("l1.l_shipdate")),
            "left_anti",
        )
        .join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "d72_tpch_q22_idle_customers",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {DAVG('c_acctbal')} AS a
      FROM customer
      WHERE c_acctbal > 0.0
        AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           {DSUM('c_acctbal')} AS totacctbal
    FROM customer, avg_bal
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > a
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-02-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def d72_tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (public spec): global sales opportunity —
    well-funded customers with no recent orders. Substitutions: the
    phone-prefix country codes become c_nationkey buckets (no c_phone
    column), and since every testdata customer has SOME order, the
    anti-join is scoped to orders after 2000-02-01 (spec shape: a
    correlated NOT EXISTS against the full orders table). The scalar
    AVG subquery broadcasts as a 1-row cross join; the decimal-exact
    DAVG keeps the threshold bit-identical in both engines, so the
    boundary comparison can't flip membership."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    c = load(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal").alias("a"))
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-02-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
