"""TPC-H queries Q2/Q11/Q16/Q20 over a DERIVED partsupp table.

The driver testdata ships no ``partsupp.parquet`` (flagged in VERDICT
r2-r4 "What's missing"), so the four partsupp queries were the only
TPC-H shapes left unimplemented. This module closes them by DERIVING
partsupp deterministically from the tables that do exist, in BOTH
engines, so the driver's full rows+schema+hash gate applies:

- ``ps_suppkey``: the public dbgen supplier-assignment formula
  (TPC-H spec 4.2.3: supplier j of part p is
  ``(p + j*(S/4 + (p-1)/S)) mod S``, adapted to these 0-based keys as
  ``(p + j*(S div 4 + p div S)) mod S`` for j in 0..3, deduplicated
  because the small test S makes the stride collide where dbgen's
  production S cannot).
- ``ps_availqty`` / ``ps_supplycost``: dbgen draws these uniformly
  (1..9999 and 1.00..1000.00); here they come from the portable
  md5-prefix hash of (partkey, suppkey) — the same cross-engine hash
  idiom as e08/e15 — giving the same distributions with a value DuckDB
  reproduces bit-for-bit.

Columns the testdata lacks keep the tpch_extra.py substitution
discipline (each docstring notes its swaps): nation predicates widen
to a REGION (the sf0.001 supplier table has ~1 supplier per nation),
``s_comment LIKE '%Complaints%'`` becomes an ``s_acctbal`` blacklist,
``p_mfgr`` display column becomes ``p_brand``.

Scale posture: partsupp is derived from ``part`` with one hash
projection and NO shuffle (the 4-way explode is per-row); at 100 TB
the derivation is a map over the part scan. The supplier count is a
1-row broadcast (BNLJ-allowlisted). Q2 decorrelates the min-cost
subquery into a partitioned window; Q11's total is a 1-row broadcast
with a dyadic (1/512) threshold so the HAVING comparison cannot
rounding-flip across engines; Q16's complaint blacklist is a
broadcast anti-join; Q20's correlated quantity subquery becomes a
grouped pre-aggregate joined on (partkey, suppkey). Every double
aggregate rides the dsum/DSUM decimal-exact contract.

Reference parity: the reference (dynamodb-zero-etl-s3tables,
README.md:170-174) promises the full Athena SQL surface over
replicated tables; TPC-H is the standing stand-in for that surface
(SURVEY.md D rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.operators.registry import (
    MH64,
    DSUM,
    dsum,
    query,
)
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

#: DuckDB-side derivation, prepended to each oracle. Mirrors
#: :func:`derived_partsupp` exactly; `//` here == `div` in Spark
#: (both floor-divide non-negative BIGINTs).
PARTSUPP_CTE = f"""
WITH sc AS (SELECT COUNT(*) AS s_count FROM supplier),
ps0 AS (
  SELECT DISTINCT p_partkey AS ps_partkey,
         (p_partkey + i.i * (s_count // 4 + p_partkey // s_count)) % s_count
           AS ps_suppkey
  FROM part, (SELECT UNNEST([0,1,2,3]) AS i) i, sc
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST(1 + h % 9999 AS BIGINT) AS ps_availqty,
         CAST(100 + (h // 9999) % 99901 AS DOUBLE) / 100.0 AS ps_supplycost
  FROM (SELECT ps_partkey, ps_suppkey,
          {MH64("'ps|' || CAST(ps_partkey AS VARCHAR) || '|' || CAST(ps_suppkey AS VARCHAR)")}
            AS h
        FROM ps0) t
)
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive partsupp(ps_partkey, ps_suppkey, ps_availqty,
    ps_supplycost) from part x supplier-count. One part scan, a 4-way
    per-row explode, a 1-row count broadcast, no shuffle. The DISTINCT
    collapses stride collisions (possible only at toy supplier counts;
    it is a hash-agg on the already-colocated part scan)."""
    s_count = load(spark, sf_dir, "supplier").agg(F.count("*").alias("s_count"))
    ps0 = (
        load(spark, sf_dir, "part")
        .select("p_partkey")
        .join(F.broadcast(s_count))
        .select(
            "p_partkey",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
            "s_count",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                (
                    F.col("p_partkey")
                    + F.col("i")
                    * (F.expr("s_count div 4") + F.expr("p_partkey div s_count"))
                )
                % F.col("s_count")
            ).alias("ps_suppkey"),
        )
        .distinct()
    )
    from dynamodb_zero_etl_s3tables_spark.operators.registry import mh64

    h = mh64(
        F.concat(
            F.lit("ps|"),
            F.col("ps_partkey").cast("string"),
            F.lit("|"),
            F.col("ps_suppkey").cast("string"),
        )
    )
    # Two-step select so the integer `div` (exact on BIGINT, unlike a
    # double `/` whose floor could flip near 2^53) can reference h.
    return ps0.select("ps_partkey", "ps_suppkey", h.alias("h")).select(
        "ps_partkey",
        "ps_suppkey",
        (F.lit(1) + F.col("h") % 9999).cast("bigint").alias("ps_availqty"),
        (
            (F.lit(100) + F.expr("h div 9999") % 99901).cast("double") / 100.0
        ).alias("ps_supplycost"),
    )


def _region_suppliers(
    spark: SparkSession, sf_dir: str, region: str
) -> DataFrame:
    """Suppliers in one region, with display columns. Dimension-scale:
    broadcast wherever joined."""
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


@query(
    "d96_tpch_q2_min_cost_supplier",
    oracle=PARTSUPP_CTE
    + """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
    FROM part, supplier, partsupp, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size BETWEEN 10 AND 20 AND p_type LIKE 'LARG%'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA')
    """,
)
def d96_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (public spec): minimum-cost supplier. Substitutions:
    region ASIA for EUROPE (sf0.001 has 4 ASIA suppliers vs 1 EUROPE),
    ``p_type LIKE '%BRASS'`` -> ``LIKE 'LARG%'`` and a size band (the
    testdata type/size domains), ``p_mfgr``/address/phone/comment ->
    ``p_brand`` (absent columns). The correlated MIN subquery is
    decorrelated the way Catalyst itself would: restrict partsupp to
    the filtered parts (correlation key is only the partkey, so this
    is semantics-preserving), compute MIN(ps_supplycost) as a window
    partitioned by ps_partkey over the region-joined rows, keep the
    rows that equal it. One shuffle on ps_partkey; suppliers, nation,
    region broadcast; no LIMIT so result order cannot matter."""
    ps = derived_partsupp(spark, sf_dir)
    parts = (
        load(spark, sf_dir, "part")
        .filter(
            F.col("p_size").between(10, 20) & F.col("p_type").like("LARG%")
        )
        .select("p_partkey", "p_brand")
    )
    eu = (
        ps.join(parts, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            F.broadcast(_region_suppliers(spark, sf_dir, "ASIA")),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eu.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "ps_supplycost",
        )
    )


@query(
    "d97_tpch_q11_important_stock",
    oracle=PARTSUPP_CTE
    + f""",
    eu AS (
      SELECT ps_partkey, ps_supplycost * ps_availqty AS v
      FROM partsupp, supplier, nation, region
      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'ASIA'
    ),
    tot AS (SELECT {DSUM('v')} AS total FROM eu)
    SELECT ps_partkey, {DSUM('v')} AS value
    FROM eu CROSS JOIN tot
    GROUP BY ps_partkey, total
    HAVING {DSUM('v')} > total / 512.0
    """,
)
def d97_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (public spec): important stock identification.
    Substitutions: region ASIA for nation GERMANY (supplier-per-nation
    sparsity at sf0.001); the spec's per-SF fraction becomes the
    dyadic 1/512 so the HAVING threshold (total/512.0) is an exact
    power-of-two divide of the decimal-exact total — no
    rounding-boundary flip between engines. Shape: one partsupp scan
    feeding BOTH the per-partkey aggregate and the 1-row grand total
    (broadcast, BNLJ-allowlisted), then the scalar HAVING filter —
    the spec's scalar subquery, decorrelated."""
    ps = derived_partsupp(spark, sf_dir)
    eu = ps.join(
        F.broadcast(
            _region_suppliers(spark, sf_dir, "ASIA").select("s_suppkey")
        ),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
    # pin: the grand-total branch exchanges to one partition while the
    # groupBy branch hash-partitions on ps_partkey, so ReuseExchange
    # cannot apply and the derived-partsupp pipeline would otherwise
    # run TWICE — the docstring's "one partsupp scan" made true
    # (r8 review)
    ).localCheckpoint(eager=True)
    tot = eu.agg(dsum("v").alias("total"))
    return (
        eu.groupBy("ps_partkey")
        .agg(dsum("v").alias("value"))
        .join(F.broadcast(tot))
        .filter(F.col("value") > F.col("total") / 512.0)
        .select("ps_partkey", "value")
    )


@query(
    "d98_tpch_q16_supplier_part_counts",
    oracle=PARTSUPP_CTE
    + """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#2' AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100.0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def d98_tpch_q16_supplier_part_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 (public spec): parts/supplier relationship.
    Substitution: the complaint blacklist (``s_comment LIKE
    '%Customer%Complaints%'``) becomes ``s_acctbal < 100`` (no comment
    column). Shape: NOT IN over a guaranteed-non-null key list is an
    anti-join (broadcast — the blacklist is supplier-dimension-sized);
    the brand/type/size filters push into the part scan before the
    partsupp join; COUNT(DISTINCT) is the two-phase expand
    HashAggregate. No LIMIT/ORDER needed (driver sorts)."""
    ps = derived_partsupp(spark, sf_dir)
    parts = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    blacklist = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 100.0)
        .select("s_suppkey")
    )
    return (
        ps.join(parts, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            F.broadcast(blacklist),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "d99_tpch_q20_excess_stock",
    oracle=PARTSUPP_CTE
    + f"""
    SELECT s_name, s_acctbal, n_name
    FROM supplier, nation, region
    WHERE s_suppkey IN (
      SELECT ps_suppkey FROM partsupp
      WHERE ps_partkey IN
            (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND ps_availqty > (
          SELECT 0.5 * {DSUM('l_quantity')}
          FROM lineitem
          WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'))
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    """,
)
def d99_tpch_q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (public spec): potential part promotion — suppliers
    holding more than half a year's shipped quantity of 'small%'
    parts. Substitutions: region ASIA for nation CANADA; ``p_name
    LIKE 'forest%'`` -> ``'small%'`` (the testdata adjective domain);
    s_address -> s_acctbal. The correlated quantity subquery
    decorrelates into a grouped pre-aggregate of the 1997 lineitem
    slice keyed (l_partkey, l_suppkey), inner-joined to partsupp —
    inner, because ``availqty > NULL`` is false in the spec's
    semantics, so no-shipment pairs drop either way. One lineitem
    shuffle on the pair key; the 'small%' part list prunes partsupp
    BEFORE that join; supplier IN(...) is a semi-join; the half
    factor is the exact 0.5 * decimal-exact sum on both engines."""
    ps = derived_partsupp(spark, sf_dir)
    small_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
    )
    excess = (
        ps.join(small_parts, F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        # no distinct: the frame feeds only a left_semi build side,
        # which deduplicates by construction — the extra shuffle +
        # HashAggregate bought nothing (r8 review)
        .select("ps_suppkey")
    )
    return (
        _region_suppliers(spark, sf_dir, "ASIA")
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal", "n_name")
    )
