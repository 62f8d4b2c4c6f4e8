"""Window functions, ordering/limits, and set operations
(SURVEY.md §2 D31-D41).

Window determinism rule: every ORDER BY inside a window carries a
unique tiebreaker column so ROW_NUMBER/lag/lead are total-ordered in
both engines. Windowed sums of doubles go through decimal casts (see
registry docstring) so frame aggregation is association-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dynamodb_zero_etl_s3tables_spark.operators.registry import query
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load


@query(
    "d31_window_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def d31_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D31: ranking family over a partitioned, total-ordered window."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "d31b_relative_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           FIRST_VALUE(c_custkey) OVER w AS richest_in_nation,
           NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS runner_up
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def d31b_relative_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D31 companion: relative-position family — percent_rank,
    cume_dist, first_value, nth_value. The ratios are IEEE divisions
    of exact row positions under a total ordering, so the raw doubles
    are bit-identical in both engines and hash directly. Do NOT round
    them: ROUND diverges at half-boundaries (Spark rounds the
    shortest decimal rendering half-up, DuckDB rounds the true binary
    value — observed at sf0.1). nth_value needs the full-partition
    frame: the default frame stops at CURRENT ROW, which would leave
    the first row's runner_up NULL in one engine and not the other."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w).alias("richest_in_nation"),
        F.nth_value("c_custkey", 2).over(wfull).alias("runner_up"),
    )


@query(
    "d32_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderdate) OVER w AS prev_date,
           LEAD(o_orderdate) OVER w AS next_date,
           DATEDIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def d32_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D32: lag/lead analytics — days between consecutive orders."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev.alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
    )


@query(
    "d33_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           COUNT(*) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_n
    FROM orders
    """,
)
def d33_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D33: running aggregate over a ROWS frame (decimal-exact sum)."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "d34_range_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
                PARTITION BY user_id
                ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS value_1h,
           COUNT(*) OVER (
                PARTITION BY user_id
                ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             AS n_1h
    FROM events
    """,
)
def d34_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D34: RANGE frame — trailing 1-hour sliding sum per user over
    epoch seconds (timestamp cast to long truncates to seconds in
    Spark; FLOOR(epoch(ts)) matches in the oracle)."""
    e = load(spark, sf_dir, "events").withColumn(
        # ts is TIMESTAMP_NTZ (plain parquet timestamp[us]); NTZ has no
        # direct long cast, so hop through TIMESTAMP (session tz is UTC)
        "ts_sec",
        F.col("ts").cast("timestamp").cast("long"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(25,6)")).over(w).cast("double").alias("value_1h"),
        F.count("*").over(w).alias("n_1h"),
    )


@query(
    "d35_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn AS rank_in_cust
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def d35_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D35: top-3 orders per customer — row_number + filter; at scale
    this is one shuffle on the partition key, no global sort."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").alias("rank_in_cust"))
    )


@query(
    "d36_global_sort",
    oracle="""
    SELECT o_orderkey, o_totalprice, maybe_priority, rn
    FROM (
      SELECT o_orderkey, o_totalprice,
             NULLIF(o_orderpriority, 'URGENT') AS maybe_priority,
             ROW_NUMBER() OVER (ORDER BY NULLIF(o_orderpriority, 'URGENT') DESC NULLS LAST,
                                o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 50
    """,
)
def d36_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D36: multi-key global sort with explicit NULLS LAST semantics,
    verified via the row_number assignment (hash check is
    order-insensitive, so ranks carry the ordering evidence).

    Plan: TakeOrderedAndProject prunes to the top 50 distributedly;
    the rank window then runs over 50 rows, not the whole table.
    """
    o = load(spark, sf_dir, "orders")
    maybe = F.nullif(F.col("o_orderpriority"), F.lit("URGENT"))
    order = [maybe.desc_nulls_last(), F.col("o_totalprice").desc(), F.col("o_orderkey")]
    top = o.select(
        "o_orderkey", "o_totalprice", maybe.alias("maybe_priority")
    ).orderBy(*order).limit(50)
    # Single-partition rank over the 50-row post-limit result is the
    # intended plan (Spark 4's EliminateWindowPartitions folds the
    # constant spec away; the benign WindowExec warning is silenced at
    # the logger in session.tune, and test_plans.py gates partition-less
    # windows to bounded inputs).
    w = W.partitionBy(F.lit(1)).orderBy(
        F.col("maybe_priority").desc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )
    return top.withColumn("rn", F.row_number().over(w))


@query(
    "d37_top_k",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def d37_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D37: ORDER BY + LIMIT -> Spark plans TakeOrderedAndProject
    (per-partition top-k, then merge — no global sort materialized)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query("d38_limit_no_sort", oracle=None)
def d38_limit_no_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D38: bare LIMIT — the literal reference query shape
    (`SELECT * ... LIMIT 10`, reference README.md:173). Rows are
    engine-dependent, so no value oracle (rows-only check)."""
    return load(spark, sf_dir, "lineitem").limit(10)


# ---------------------------------------------------------------------------
# D-set: set operations
# ---------------------------------------------------------------------------

@query(
    "d39_union",
    oracle="""
    SELECT kind, key_id, name FROM (
      SELECT 'customer' AS kind, c_custkey AS key_id, c_name AS name FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_suppkey AS key_id, s_name AS name FROM supplier
    )
    """,
)
def d39_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D39: UNION ALL by name across heterogenous entity tables."""
    c = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("key_id"),
        F.col("c_name").alias("name"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("key_id"),
        F.col("s_name").alias("name"),
    )
    return c.unionByName(s)


@query(
    "d39b_union_distinct",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation WHERE n_regionkey = 0
    UNION
    SELECT c_nationkey AS nationkey FROM customer
    """,
)
def d39b_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D39: UNION DISTINCT (union + dedup)."""
    a = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0).select(
        F.col("n_nationkey").alias("nationkey")
    )
    b = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return a.unionByName(b).distinct()


@query(
    "d40_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def d40_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D40: INTERSECT — customers having both final and open orders."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query(
    "d41_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def d41_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D41: EXCEPT ALL (bag semantics — multiplicity preserved)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b)


@query(
    "d73_rolling_distinct_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT event_type, date_trunc('day', ts) AS day, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT event_type, day FROM daily)
    SELECT d.event_type, d.day,
           (SELECT COUNT(DISTINCT u.user_id) FROM daily u
            WHERE u.event_type = d.event_type
              AND u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day) AS users_7d
    FROM days d
    """,
)
def d73_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D31/D34 companion: rolling 7-day DISTINCT user count per event
    type — the windowed COUNT(DISTINCT) Spark's window functions
    refuse directly; expressed as collect_set over a RANGE frame on
    day numbers, then one row kept per (type, day). The
    (type, day, user) input is pre-deduplicated, so window state per
    row is bounded by active users in the frame, not by event volume;
    everything rides ONE hash partitioning on event_type. The oracle
    cross-checks with a correlated COUNT(DISTINCT) subquery."""
    e = load(spark, sf_dir, "events")
    daily = e.select(
        "event_type",
        # date_trunc (not to_date): both engines then carry the day as
        # a timestamp, which the comparison harness hashes identically
        F.date_trunc("day", F.col("ts")).alias("day"),
        "user_id",
    ).distinct()
    day_num = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        W.partitionBy("event_type")
        .orderBy(day_num)
        .rangeBetween(-6, 0)
    )
    return (
        daily.withColumn(
            "users_7d", F.size(F.collect_set("user_id").over(w)).cast("bigint")
        )
        .select("event_type", "day", "users_7d")
        .distinct()
    )


@query(
    "d95_analytic_completeness",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag,
             l_extendedprice AS price,
             NTILE(10) OVER (PARTITION BY l_returnflag
                             ORDER BY l_extendedprice, l_orderkey,
                                      l_linenumber) AS tile,
             RANK() OVER (PARTITION BY l_returnflag
                          ORDER BY l_extendedprice, l_orderkey,
                                   l_linenumber) AS rnk,
             PERCENT_RANK() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_orderkey,
                                           l_linenumber) AS pr,
             CUME_DIST() OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey,
                                        l_linenumber) AS cd,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT flag, CAST(tile AS INT) AS tile, COUNT(*) AS n_rows,
           CAST(MIN(rnk) AS BIGINT) AS min_rank,
           CAST(MAX(rnk) AS BIGINT) AS max_rank,
           BOOL_AND(ABS(pr - CAST(rnk - 1 AS DOUBLE) / (n - 1)) < 1e-12
                    AND cd >= pr AND cd <= 1.0
                    AND cd >= CAST(rnk AS DOUBLE) / n - 1e-12)
             AS identities_ok
    FROM w GROUP BY flag, tile
    """,
)
def d95_analytic_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D31 completion: the remaining ANSI analytic functions —
    NTILE(10), PERCENT_RANK, CUME_DIST — exercised together over a
    total order and pinned by ORACLE-PINNED BOOLEAN identities (the
    d25/d48b discipline): every row must satisfy
    percent_rank = (rank-1)/(n-1) and rank/n <= cume_dist <= 1 in
    BOTH engines, so the hash-match proves Spark's implementations
    follow the ANSI definitions rather than comparing raw float
    columns whose engine ROUND ties could diverge. Emitted cells are
    integers/booleans only (tile occupancy + rank spans) — exact.

    Scale: one hash-partition shuffle on the partition key serves all
    four window functions (Catalyst computes them in a single Window
    node over one sort); the decile aggregate is a partial hash-agg.
    Total order via (price, orderkey, linenumber) makes NTILE's
    bucket boundaries deterministic."""
    order = [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    wspec = W.partitionBy("l_returnflag").orderBy(*order)
    wall = W.partitionBy("l_returnflag")
    li = load(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_returnflag").alias("flag"),
        F.ntile(10).over(wspec).alias("tile"),
        F.rank().over(wspec).alias("rnk"),
        F.percent_rank().over(wspec).alias("pr"),
        F.cume_dist().over(wspec).alias("cd"),
        F.count("*").over(wall).alias("n"),
    )
    ok = (
        (
            F.abs(
                F.col("pr")
                - (F.col("rnk") - 1).cast("double") / (F.col("n") - 1)
            )
            < 1e-12
        )
        & (F.col("cd") >= F.col("pr"))
        & (F.col("cd") <= 1.0)
        & (F.col("cd") >= F.col("rnk").cast("double") / F.col("n") - 1e-12)
    )
    return w.groupBy("flag", "tile").agg(
        F.count("*").alias("n_rows"),
        F.min("rnk").cast("bigint").alias("min_rank"),
        F.max("rnk").cast("bigint").alias("max_rank"),
        F.bool_and(ok).alias("identities_ok"),
    )
