"""Event-sequence analytics over the ``events`` stream table: funnel
progression and cohort retention — the query shapes a replicated
event table exists to answer (the reference's "query with Athena"
surface, reference README.md:170-174, over CDC-replicated app events).

Scale posture: both operators do ALL per-user sequencing inside ONE
hash partitioning on ``user_id`` — stacked window functions over the
same partition key reuse a single Exchange (no self-joins, no second
shuffle for the dependent steps). The final rollups aggregate tiny
outputs (stage counts / cohort-week cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dynamodb_zero_etl_s3tables_spark.operators.registry import DSUM, dsum, query
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load


@query(
    "d57_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM events
    ), s2 AS (
      SELECT user_id, ts, event_type, t_view,
             MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
      FROM s1
    ), s3 AS (
      SELECT user_id, t_view, t_click,
             MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
               OVER (PARTITION BY user_id) AS t_purchase
      FROM s2
    ), per_user AS (
      SELECT user_id, MAX(t_view) AS t_view, MAX(t_click) AS t_click,
             MAX(t_purchase) AS t_purchase
      FROM s3 GROUP BY user_id
    )
    SELECT COUNT(t_view) AS n_view,
           COUNT(t_click) AS n_view_click,
           COUNT(t_purchase) AS n_view_click_purchase
    FROM per_user
    """,
)
def d57_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: each stage's
    timestamp is the user's first qualifying event STRICTLY AFTER the
    previous stage. Three stacked windows over one ``user_id``
    partitioning (dependent stages reuse the same Exchange — check
    the plan: one shuffle, three Window nodes), then a global
    three-counter rollup."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = e.select("user_id", "ts", "event_type", t_view.alias("t_view"))
    t_click = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")), F.col("ts"))
    ).over(w)
    s2 = s1.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    s3 = s2.withColumn("t_purchase", t_purchase)
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"),
    )


@query(
    "d58_cohort_retention",
    oracle="""
    WITH u AS (
      SELECT user_id, ts,
             date_trunc('week', MIN(ts) OVER (PARTITION BY user_id)) AS cohort_week
      FROM events
    ), cell AS (
      SELECT DISTINCT user_id, cohort_week,
             date_diff('day', cohort_week, date_trunc('week', ts)) // 7 AS week_offset
      FROM u
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_users
    FROM cell
    GROUP BY cohort_week, week_offset
    """,
)
def d58_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    in each later week they return. First-activity via a window min on
    the ``user_id`` partitioning; (user, cohort, offset) distinct then
    a cells rollup — output is cohorts x offsets, metadata-sized
    regardless of input scale."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    u = e.select(
        "user_id",
        "ts",
        F.date_trunc("week", F.min("ts").over(w)).alias("cohort_week"),
    )
    cell = u.select(
        "user_id",
        "cohort_week",
        F.floor(
            F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
        ).alias("week_offset"),
    ).distinct()
    return cell.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_users")
    )


@query(
    "d59_tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def d59_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (public spec): unshipped-order revenue by
    priority. Plan shape that matters at 100 TB: both date filters
    push to the parquet scans BEFORE the joins, the customer side
    arrives pre-filtered to one segment, and the top-10 rides
    TakeOrderedAndProject — no global sort materializes."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "d60_tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '2000-01-01'
      AND o_orderdate <  TIMESTAMP '2000-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def d60_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (public spec): customers who returned the most
    revenue in a quarter. Nation broadcasts (25 rows at any scale);
    the quarter filter prunes orders at the scan; returned-lineitem
    filter prunes the probe side; top-20 is TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "d64_tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '2000-01-01'
      AND o_orderdate <  TIMESTAMP '2001-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def d64_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (public spec): revenue from orders where the
    supplier and customer share a nation, by nation within one region.
    The interesting join structure: lineitem joins BOTH supplier and
    (via orders) customer, and the two paths must agree on nationkey —
    a join-graph cycle the optimizer resolves as an extra equi-filter,
    not an extra shuffle. Nation/region/supplier broadcast; the year
    filter prunes orders at the scan; one final tiny rollup."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "d65_tpch_q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {DSUM('l_quantity')} AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def d65_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (public spec): customers with very large
    orders. The shape that matters: the HAVING pre-aggregate runs
    FIRST over lineitem (map-side partial sums collapse each order
    before its shuffle), and the surviving big-order keys drive a
    semi-join that prunes the second lineitem pass — never a full
    3-way join of unfiltered tables. Top-100 rides
    TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "d66_timeseries_gapfill",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_events,
             {DSUM('value')} AS day_value
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ), spine AS (
      SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM span
    )
    SELECT s.user_id, s.day,
           COALESCE(d.n_events, 0) AS n_events,
           LAST_VALUE(d.day_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def d66_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: densify each user's daily activity onto a
    continuous date spine (generated per user from their own span, so
    no global calendar join) and carry the last observed daily value
    forward across silent days (LOCF via ``last(..., ignorenulls)``).

    Scale shape: the spine is a map-side ``sequence``+``explode`` of
    per-user (min, max) — rows generated where they will be consumed,
    no cross join against a calendar table; the fill window rides the
    same user_id partitioning as the daily rollup. Spine size is
    users x days, independent of event volume."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n_events"), dsum("value").alias("day_value"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last("day_value", ignorenulls=True).over(w).alias("locf_value"),
        )
    )


@query(
    "d77_scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) IS NULL
             AS is_current
    FROM changes
    """,
)
def d77_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 from a change stream — the
    classic warehouse materialization the reference's CDC-to-Iceberg
    replication exists to feed: per user, collapse consecutive equal
    attribute values (here event_type stands in for the tracked
    attribute) into validity intervals [valid_from, valid_to) with an
    is_current flag on the open row. Two stacked windows on ONE
    user_id shuffle (d57's funnel discipline): lag() finds change
    points, lead() over the survivors closes each interval. Ties
    break on (ts, event_id) so both engines pick identical change
    rows. At 100 TB this is one keyed shuffle + narrow filters — the
    incremental form applies the same logic per CDC batch against the
    current open rows."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    ).select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    w2 = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    valid_to = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@query(
    "d88_hypertable_rollup",
    oracle="""
    WITH hourly AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
             event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(25,6))) AS v_dec
      FROM events
      GROUP BY 1, 2
    )
    SELECT CAST(date_trunc('day', bucket_hour) AS TIMESTAMP) AS bucket_day,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(v_dec) AS DOUBLE) AS total_value,
           COUNT(*) AS n_hours
    FROM hourly
    GROUP BY 1, 2
    """,
)
def d88_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-family scale pattern: HYPERTABLE ROLLUP CASCADE (the
    continuous-aggregate shape TimescaleDB popularized, public) — the
    daily aggregate is computed FROM the hourly aggregate's partial
    states, never by rescanning raw events. The partials are chosen
    mergeable on purpose: counts sum, exact-DECIMAL value sums sum,
    and distinct-hour counts fall out of the hourly row count. At
    100 TB this is the difference between a daily report that reads
    24x fewer, kilobyte-sized rollup rows and one that re-reads the
    raw table; the same cascade continues upward (day -> month) with
    the identical plan shape, and each level is exactly what a
    streaming materialized view would maintain incrementally (c08).

    Determinism: the only float aggregate rides DECIMAL(25,6) at the
    hourly level and re-sums exactly at the daily level — merge order
    cannot change the result, which is WHY the rollup is re-usable:
    mergeability and order-independence are the same property."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("bucket_hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("v_dec"),
        )
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "bucket_hour").alias("bucket_day"),
            "event_type",
        )
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("v_dec").cast("double").alias("total_value"),
            F.count("*").alias("n_hours"),
        )
    )
