"""TPC-H query shapes, third tranche (public TPC-H spec, adapted to
the reduced testdata columns): Q6 (pure scan-predicate aggregate), Q7
(bidirectional nation-pair volume), Q8 (national market share ratio),
Q13 (outer-join count-of-counts distribution), Q15 (top supplier via
scalar-max view), Q17 (per-part average quantity threshold).

Together with Q1/Q3/Q5/Q10/Q18 (aggregates.py / analytics.py) and
Q4/Q12/Q14/Q19/Q21/Q22 (tpch_extra.py) this closes out every TPC-H
query expressible over the available tables — the remaining four
(Q2/Q11/Q16/Q20) all require partsupp, which the testdata does not
ship (flagged in VERDICT r2 "What's missing" #2).

As in tpch_extra.py, columns the testdata lacks (l_commitdate,
l_receiptdate, l_shipmode, p_container, c_phone, o_comment) have
their predicates re-targeted at existing columns; each docstring
notes the substitution. The JOIN/SUBQUERY SHAPE — what Catalyst must
plan — is preserved exactly.

Scale posture: dimension sides broadcast; fact-fact joins shuffle
once on their equi-key; scalar subqueries broadcast 1-row results;
every revenue sum is the order-independent decimal-exact dsum/DSUM
pair so cross-engine hashes cannot drift (FIXTURES.md determinism
contract). Plan shapes are enforced registry-wide by
tests/test_plans.py (no CartesianProduct, no SortAggregate).
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
    "d79_tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {DSUM('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.04 AND l_discount <= 0.06
      AND l_quantity < 24
    """,
)
def d79_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (public spec): forecasting revenue change — the purest
    scan shape in the suite: no join, three pushable predicates, one
    global aggregate. The planner point is total pushdown: all three
    filters must reach the parquet scan (PushedFilters) and ReadSchema
    must carry exactly the four referenced columns; the aggregate is a
    partial+final HashAggregate over a 1-group key. COUNT(*) rides
    along so the oracle check pins the selected-row population, not
    just the sum."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "d80_tpch_q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {DSUM('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             YEAR(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey
        AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ( (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
           OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13') )
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def d80_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (public spec): volume shipping between two nations in
    both directions, split by year. The shape under test is the
    DISJUNCTIVE cross-dimension predicate (FRANCE→GERMANY OR
    GERMANY→FRANCE): it cannot be pushed into either dimension alone,
    so it must survive as a residual after both broadcast hash joins
    while each nation table still broadcasts. lineitem→orders→customer
    chains on the orderkey/custkey shuffles; supplier and both nation
    copies broadcast. The spec's FRANCE/GERMANY pair maps to
    NATION_13/NATION_19 (testdata nation names), chosen so BOTH
    directions return rows at every SF including sf0.001 — the
    previous NATION_1/NATION_2 pair made the smallest-scale gate pass
    vacuously on empty results (ADVICE r3 #3)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = (
        load(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("s_nkey"),
            F.col("n_name").alias("supp_nation"),
        )
        .filter(F.col("supp_nation").isin("NATION_13", "NATION_19"))
    )
    n2 = (
        load(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("c_nkey"),
            F.col("n_name").alias("cust_nation"),
        )
        .filter(F.col("cust_nation").isin("NATION_13", "NATION_19"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_13") & (F.col("cust_nation") == "NATION_19")
    ) | (
        (F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_13")
    )
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(vol).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "d81_tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           {DSUM("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END")}
         / {DSUM('volume')} AS mkt_share
    FROM (
      SELECT YEAR(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey
        AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
        AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
        AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def d81_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (public spec): national market share — the widest join
    in the suite (8 tables: both fact tables plus part, supplier,
    customer, two nation roles, region), feeding a conditional-sum /
    total-sum ratio per year. Substitutions: p_type = 'STANDARD' for
    the spec's 'ECONOMY ANODIZED STEEL', NATION_3 for BRAZIL, EUROPE
    region kept as-is. All six dimension sides broadcast; the only
    shuffles are lineitem↔orders on orderkey and orders↔customer on
    custkey. Both ratio operands are decimal-exact sums cast to
    DOUBLE, so the IEEE division is bit-identical across engines — no
    ROUND (FIXTURES.md rule)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    r = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    target = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(target) / dsum(vol)).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "d82_tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def d82_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (public spec): customer order-count distribution —
    the only query in the suite whose outer-join residual lives in the
    ON clause (spec: o_comment NOT LIKE '%special%requests%'; here
    o_orderpriority <> '1-URGENT', same position). The two-level
    aggregate is the shape under test: COUNT(o_orderkey) counts only
    matched rows (NULL-skipping), preserving never-ordered customers
    as c_count = 0, then the count-of-counts collapses to at most a
    few hundred groups. First agg shuffles on c_custkey (the outer
    join's own key — AQE coalesces the shared exchange); second agg is
    near-free. LEFT joins with ON-clause residuals must NOT push the
    filter below the join (that would turn it into an inner join) —
    the test is that both engines agree on exactly that semantics."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "d83_tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {DSUM('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-10-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def d83_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (public spec): top supplier — a reused view (the
    quarterly revenue aggregate) consumed twice: once as the join
    input, once reduced to a scalar MAX that selects the winner(s).
    The revenue aggregate is one shuffle on l_suppkey; the scalar MAX
    broadcasts as a 1-row side; supplier broadcasts. Equality on
    total_revenue is safe ONLY because dsum/DSUM make both engines'
    sums decimal-exact before the double cast — float-summed revenue
    would make `= MAX(...)` flaky (the reason the spec itself is
    written against exact NUMERIC)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(rev).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "d84_tpch_q17_small_quantity_revenue",
    oracle=f"""
    SELECT {DSUM('l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#23'
      AND p_size <= 20
      AND l_quantity < (
        SELECT 0.2 * {DAVG('l_quantity')}
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def d84_tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (public spec): small-quantity-order revenue — the
    correlated SCALAR AVG subquery per part (p_container = 'MED BOX'
    becomes p_size <= 20 — non-vacuous at sf0.001; no container column). De-correlation is the
    shape under test: the per-part average becomes a groupBy on
    l_partkey joined back to the filtered fact — NOT a per-row
    re-scan. Threshold averages are computed ONLY for the parts that
    survive the brand/size filter (the semi-join prunes the aggregate
    input — at 100 TB that is the difference between aggregating 60 k
    parts and 20 M). Both engines derive the 0.2×avg threshold from
    the same decimal-exact mean, so the boundary comparison cannot
    flip membership. COUNT(*) pins the selected population."""
    p = (
        load(spark, sf_dir, "part")
        # p_size <= 20, not 10: at sf0.001 the tighter filter selected
        # ZERO lineitems, making the smallest-scale gate vacuous (the
        # d80/ADVICE r3 #3 class — a broken threshold join would smoke-
        # pass); 20 keeps 4 qualifying lines at sf0.001 (r8 review)
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 20))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # Per-part threshold, computed only over parts of interest.
    thresh = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey")
        .agg((F.lit(0.2) * davg("l_quantity")).alias("qty_thresh"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        li.join(F.broadcast(thresh), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )
