"""Scan / projection / filter / join operators (SURVEY.md §2 D1-D21).

These realize the relational surface the reference commits to via
"Query with Amazon Athena" (reference README.md:170-174) — full SQL
over the replicated tables. Each builder is declarative DataFrame
code; Catalyst supplies pushdown, pruning, and join selection.

Scale notes (SURVEY.md E7) are on each operator: joins either
broadcast a dimension-sized side or shuffle on a key whose
cardinality grows with data size (no driver-side collect anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dynamodb_zero_etl_s3tables_spark.operators.registry import DSUM, dsum, query
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load


# ---------------------------------------------------------------------------
# D-scan + D-row: scans, projection, filters
# ---------------------------------------------------------------------------

@query(
    "d01_parquet_scan",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def d01_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: Parquet scan with filter+projection pushed into the reader
    (verified in tests via PushedFilters/ReadSchema in the plan)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


@query(
    "d06_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_quantity AS qty
    FROM lineitem
    WHERE l_returnflag = 'A'
    """,
)
def d06_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: projection, rename, computed column (same IEEE expr both
    engines -> bit-identical without rounding)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "A")
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.col("l_quantity").alias("qty"),
        )
    )


@query(
    "d07_filter_boolean",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE (o_totalprice > 1000 AND o_orderstatus = 'F')
       OR (o_totalprice < 50 AND NOT o_orderstatus = 'F')
    """,
)
def d07_filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: comparison + AND/OR/NOT boolean filter composition."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_totalprice") > 1000) & (F.col("o_orderstatus") == "F"))
        | ((F.col("o_totalprice") < 50) & (~(F.col("o_orderstatus") == "F")))
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")


@query(
    "d08_predicates",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_acctbal BETWEEN 0 AND 5000
      AND c_name LIKE '%1%'
    """,
)
def d08_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: IN / BETWEEN / LIKE predicates."""
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_acctbal").between(0, 5000)
        & F.col("c_name").like("%1%")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@query(
    "d09_null_semantics",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS maybe_status,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F') AS is_f_nullsafe,
           (NULLIF(o_orderstatus, 'O') IS NULL) AS was_open
    FROM orders
    """,
)
def d09_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9: isNull / coalesce / nullif / null-safe equality (<=>)."""
    o = load(spark, sf_dir, "orders")
    maybe = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        maybe.alias("maybe_status"),
        F.coalesce(maybe, F.lit("OPEN")).alias("status_or_open"),
        maybe.eqNullSafe(F.lit("F")).alias("is_f_nullsafe"),
        maybe.isNull().alias("was_open"),
    )


@query(
    "d10_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 2000 THEN 'high'
                WHEN o_totalprice >= 500 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE o_orderstatus WHEN 'F' THEN 1 ELSE 0 END AS is_final
    FROM orders
    """,
)
def d10_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10: CASE WHEN conditional expressions."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 2000, "high")
        .when(F.col("o_totalprice") >= 500, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
    )


@query(
    "d11_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def d11_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11: distinct projection (hash-aggregate under the hood)."""
    return load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# D-join: every join shape
# ---------------------------------------------------------------------------

@query(
    "d12_join_inner",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {DSUM('o.o_totalprice')} AS total_revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def d12_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12: inner equi-join orders->customer; shuffles on custkey
    (both sides grow with SF) then hash-aggregates on a low-card key."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_revenue"),
        )
    )


@query(
    "d13_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_urgent
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority = 'URGENT'
    GROUP BY c.c_custkey, c.c_name
    """,
)
def d13_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13: left outer join preserving customers with zero matches
    (COUNT of the nullable side counts only matches)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_urgent"))
    )


@query(
    "d13b_join_full_outer",
    oracle="""
    SELECT n.n_nationkey, n.n_name, s.s_suppkey, s.s_name
    FROM nation n FULL OUTER JOIN supplier s ON s.s_nationkey = n.n_nationkey
    """,
)
def d13b_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13: full outer join; nations without suppliers surface nulls."""
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    return n.join(s, s.s_nationkey == n.n_nationkey, "full").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@query(
    "d14_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 3000)
    """,
)
def d14_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14: left-semi join == EXISTS; never duplicates the left side."""
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 3000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "d15_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = 'URGENT')
    """,
)
def d15_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15: left-anti join == NOT EXISTS — the core shape of the
    reference Lambda's Sid filter (lambda/catalog-policy-handler.js:52)
    and of CDC delete propagation (B7)."""
    c = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "URGENT")
    return c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "d16_join_broadcast_star",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_orders,
           {DSUM('o.o_totalprice')} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def d16_join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D16: explicit broadcast of dimension tables — at 100 TB the
    fact side never shuffles for dim joins; only the orders->customer
    equi-join shuffles (both scale with SF)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@query(
    "d17_join_theta",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS region_key
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def d17_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D17: theta (non-equi) join — unordered nation pairs within a
    region. Equi part shuffles/broadcasts; `<` is a post-filter, so
    this stays a hash join, not a nested-loop."""
    a = load(spark, sf_dir, "nation").alias("a")
    b = load(spark, sf_dir, "nation").alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("region_key"),
    )


@query(
    "d18_cross_join",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def d18_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D18: cross join of two bounded inputs (5 regions x statuses)."""
    r = load(spark, sf_dir, "region")
    s = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).select("r_name", "o_orderstatus")


@query(
    "d19_range_join",
    oracle=f"""
    SELECT p.user_id, p.event_id AS purchase_id,
           COUNT(e.event_id) AS n_follow,
           {DSUM('e.value')} AS follow_value
    FROM events p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts > p.ts
     AND e.ts <= p.ts + INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    GROUP BY p.user_id, p.event_id
    """,
)
def d19_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19: range/interval join — events within 1h after each purchase.

    Scale posture: the range condition rides on a user_id equi-join, so
    Spark executes a shuffled hash join on user_id (cardinality grows
    with SF; ~67 events/user stays constant) with the interval as a
    residual filter — never a nested loop over the full table.
    """
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = p.join(
        e,
        (e.user_id == p.p_user)
        & (e.ts > p.p_ts)
        & (e.ts <= p.p_ts + F.expr("INTERVAL 1 HOUR")),
    )
    return (
        joined.groupBy(F.col("p_user").alias("user_id"), "purchase_id")
        .agg(F.count("event_id").alias("n_follow"), dsum("value").alias("follow_value"))
    )


@query(
    "d20_asof_join",
    oracle="""
    WITH pc AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
             c.ts AS click_ts, c.event_id AS click_id,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM events p
      JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
      WHERE p.event_type = 'purchase'
    )
    SELECT purchase_id, user_id, purchase_ts, click_ts, click_id
    FROM pc WHERE rn = 1
    """,
)
def d20_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D20: as-of join — latest click at-or-before each purchase, per
    user (the CDC snapshot-at-t shape, SURVEY §2 D20). Implemented as
    equi-join on user + inequality residual + row_number; per-user
    match count is bounded, so state stays small at scale."""
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    w = W.partitionBy("purchase_id").orderBy(
        F.col("click_ts").desc(), F.col("click_id").desc()
    )
    return (
        p.join(c, (c.c_user == p.p_user) & (F.col("click_ts") <= F.col("purchase_ts")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            F.col("p_user").alias("user_id"),
            "purchase_ts",
            "click_ts",
            "click_id",
        )
    )


@query(
    "d21_star_join_flagship",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_lines,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND c.c_mktsegment = 'BUILDING'
    GROUP BY r.r_name, n.n_name
    """,
)
def d21_star_join_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D21 flagship: 5-way star join (lineitem->orders->customer->
    nation->region), the engine's realization of the reference's
    'query your replicated table' (README.md:173).

    Plan shape at scale: shipdate filter pushed to the lineitem scan;
    lineitem<->orders shuffle on orderkey (the only big-big shuffle);
    customer joined via shuffle; nation/region broadcast.
    """
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


_D61_SQL = """
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = o.o_orderkey
                        AND l2.l_returnflag = 'R')
"""


@query("d61_correlated_subqueries", oracle=_D61_SQL)
def d61_correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — the same ANSI text runs on both
    engines (SURVEY §4.2 subquery decorrelation: Catalyst rewrites the
    correlated subqueries into a left-semi and a left-anti hash join
    on l_orderkey; no per-row re-execution). Integer predicates keep
    the semantics float-free and order-independent."""
    from dynamodb_zero_etl_s3tables_spark.sources.testdata import register_views

    register_views(spark, sf_dir)
    return spark.sql(_D61_SQL)


# ---------------------------------------------------------------------------
# D74: bloom-filter semi-join (manual runtime-filter construction)
# ---------------------------------------------------------------------------

import os as _os

#: bloom sizing knobs (env-tunable per deployment): m bits / k probes.
#: Defaults target ~1e-3 false positives at ~5k build keys; at larger
#: build sides scale SPARK_GRAFT_BLOOM_BITS linearly (fp only costs
#: extra candidate rows — the exact join removes them either way).
BLOOM_BITS = int(_os.environ.get("SPARK_GRAFT_BLOOM_BITS", str(1 << 16)))
BLOOM_K = int(_os.environ.get("SPARK_GRAFT_BLOOM_K", "4"))
if BLOOM_BITS % 64 != 0 or BLOOM_BITS <= 0:
    # the bitmap is a list of 64-bit words: a non-multiple-of-64 size
    # would truncate the tail word, and probe positions hashed into
    # the truncated range would read NULL -> the prefilter silently
    # DROPS true members (false negatives — wrong results, not an
    # error). Refuse the knob at import (r8 review).
    raise ValueError(
        f"SPARK_GRAFT_BLOOM_BITS={BLOOM_BITS}: must be a positive "
        "multiple of 64 (the bitmap is stored as 64-bit words)"
    )


def bloom_bitmap(keys: DataFrame, col: str) -> list:
    """Build a bloom bitmap (list of BLOOM_BITS/64 int64 words) from a
    key column: k=BLOOM_K probe positions per key via seeded xxhash64,
    OR-combined per 64-bit word by one partial-aggregated shuffle of
    <= BLOOM_BITS/64 rows. The driver collect is the bitmap itself —
    bounded by construction (8 KiB at the default), NOT by data size;
    this mirrors what Spark's own runtime bloom-filter rule
    materializes at the driver."""
    n_words = BLOOM_BITS // 64
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(BLOOM_BITS))
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("int").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    by_word = {r["word"]: r["bits"] for r in words.collect()}
    return [by_word.get(w, 0) for w in range(n_words)]


def bloom_prefilter(df: DataFrame, col_name: str, bitmap: list) -> DataFrame:
    """Probe-side bloom pre-filter: keep rows whose key hits all k
    seeded positions in the literal bitmap. Pure JVM expressions —
    evaluate inside the scan's filter stage, no join, no Python.
    False positives pass (removed by the exact join downstream);
    false negatives are impossible (same seeds as the build)."""
    arr = F.array(*[F.lit(int(x)).cast("bigint") for x in bitmap])
    out = df.withColumn("__bloom", arr)
    for i in range(BLOOM_K):
        out = (
            out.withColumn(
                "__p",
                F.pmod(F.xxhash64(F.col(col_name), F.lit(i)), F.lit(BLOOM_BITS)),
            )
            .filter(
                F.expr(
                    "(element_at(__bloom, CAST(__p / 64 AS INT) + 1)"
                    " & shiftleft(CAST(1 AS BIGINT), CAST(pmod(__p, 64) AS INT)))"
                    " != 0"
                )
            )
        )
    return out.drop("__bloom", "__p")


@query(
    "d74_bloom_semi_join",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {DSUM('o_totalprice')} AS revenue
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
)
def d74_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-family extension: semi-join with a hand-built bloom runtime
    filter — the 100 TB pattern for "fact ⋉ selectively-filtered dim"
    when the dim side is too large to broadcast: probe a bloom of the
    dim keys INSIDE the fact scan's filter (map-side, no shuffle, no
    Python), so only probable matches reach the exact semi-join that
    removes the false positives. The final result is therefore
    EXACTLY the plain semi-join (the oracle) — the bloom changes row
    flow, never semantics. Spark's own runtime row-group filtering
    (spark.sql.optimizer.runtime.bloomFilter) applies the same idea
    automatically where statistics justify it; this operator is the
    explicit, tunable form (BLOOM_BITS / BLOOM_K env knobs).

    Scale: bitmap build is one partial-aggregated shuffle of <= m/64
    words; the bitmap (8 KiB default) ships as a literal with the
    probe predicate; candidates alone shuffle for the verify join."""
    c = load(spark, sf_dir, "customer")
    keys = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bitmap = bloom_bitmap(keys, "c_custkey")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    cand = bloom_prefilter(o, "o_custkey", bitmap)
    exact = cand.join(
        keys, cand.o_custkey == keys.c_custkey, "left_semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# D78: recursive CTE — hierarchy traversal (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

# Same ANSI text runs on BOTH engines (the d61 discipline). The
# hierarchy is derived deterministically from the customer key:
# parent(c) = floor(c / 10), roots are keys < 10 — a ~5-level tree at
# any SF with no extra fixture data.
_D78_SQL = """
    WITH RECURSIVE chain(node, cur, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      UNION ALL
      SELECT node, CAST(FLOOR(cur / 10.0) AS BIGINT), depth + 1
      FROM chain WHERE cur >= 10
    )
    SELECT cur AS root,
           COUNT(*) AS n_nodes,
           MAX(depth) AS max_depth,
           CAST(MIN(node) AS BIGINT) AS min_node
    FROM chain
    WHERE cur < 10
    GROUP BY cur
"""


@query("d78_recursive_hierarchy", oracle=_D78_SQL)
def d78_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): climb a derived
    parent hierarchy (parent = floor(key/10)) from every customer to
    its single-digit root, then roll up per root — the org-chart /
    bill-of-materials traversal shape classic warehouses need and
    Spark could not express before 4.0. Identical SQL text runs on
    both engines. Execution is the iterative union-fixpoint: each
    step is one narrow filter + projection over the frontier, depth
    bounded by the tree height (~log10(keys)), so at 100 TB the cost
    is height x frontier scans — same shape as e02h's label
    propagation, but planned natively by Catalyst."""
    from dynamodb_zero_etl_s3tables_spark.sources.testdata import register_views

    register_views(spark, sf_dir)
    return spark.sql(_D78_SQL)


#: d91 grid geometry: 1-hour buckets (microseconds)
_GRID_US = 3_600_000_000


@query(
    "d91_interval_grid_join",
    oracle=f"""
    WITH w AS (
      SELECT event_id AS window_id, ts AS start_ts
      FROM events WHERE event_type = 'purchase' AND user_id % 20 = 0
    )
    SELECT w.window_id, COUNT(e.event_id) AS n_events,
           {DSUM('e.value')} AS window_value
    FROM w JOIN events e
      ON e.ts > w.start_ts AND e.ts <= w.start_ts + INTERVAL 1 HOUR
    GROUP BY w.window_id
    """,
)
def d91_interval_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-surface: INTERVAL OVERLAP JOIN WITHOUT AN EQUI KEY via the
    GRID (interval-index) technique — count every event landing in
    each promo window regardless of user. d19's range join rides a
    user_id equi-key; with no shared key a naive plan is a theta
    join over the full cross product (the CartesianProduct the plan
    gate forbids). The grid construction restores an equi key:
    events map to their single 1-hour epoch bucket (exact integer
    DIV on epoch micros — no float rounding at bucket boundaries),
    each window explodes to the buckets it covers (2 for a 1-hour
    window), the join runs on the bucket, and the exact interval
    predicate filters residually. An event's single bucket is
    covered by every interval that contains the event, so each
    matching pair appears EXACTLY once — no post-join dedup. The
    oracle states the same result as the plain theta join.

    Scale: shuffle volume is events + windows x buckets-per-window,
    keyed by uniformly-distributed time buckets; cost is pairs that
    SHARE a bucket, not the cross product. Dense hot hours salt like
    any skewed key (d75). This is the standard distributed interval-
    index join (public: Spark range-join optimization literature)."""
    e = load(spark, sf_dir, "events")
    us = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col("ts"),
    )
    ev = e.select(
        "event_id", "value", F.col("ts").alias("ev_ts"), us.alias("ev_us")
    ).withColumn("bucket", F.expr(f"ev_us DIV {_GRID_US}"))
    w = (
        e.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 20 == 0))
        .select(
            F.col("event_id").alias("window_id"),
            F.col("ts").alias("start_ts"),
            us.alias("s_us"),
        )
        .withColumn("end_ts", F.col("start_ts") + F.expr("INTERVAL 1 HOUR"))
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.expr(f"s_us DIV {_GRID_US}"),
                    F.expr(f"(s_us + {_GRID_US}) DIV {_GRID_US}"),
                )
            ),
        )
    )
    return (
        w.join(ev, "bucket")
        .filter(
            (F.col("ev_ts") > F.col("start_ts"))
            & (F.col("ev_ts") <= F.col("end_ts"))
        )
        .groupBy("window_id")
        .agg(
            F.count("event_id").alias("n_events"),
            dsum("value").alias("window_value"),
        )
    )
