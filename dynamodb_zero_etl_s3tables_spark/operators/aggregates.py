"""Aggregation operators (SURVEY.md §2 D22-D30).

All grouped aggregates get partial (map-side) + final aggregation from
Spark automatically; shuffle width is the group-key cardinality, not
the input size. Float determinism via decimal-sum (registry.dsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dynamodb_zero_etl_s3tables_spark.operators.registry import (
    DAVG,
    DSUM,
    davg,
    dsum,
    fan_out,
    mh64,
    query,
)
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load


@query(
    "d22_grouped_agg_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity')} AS sum_qty,
           {DSUM('l_extendedprice')} AS sum_base_price,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {DAVG('l_quantity')} AS avg_qty,
           {DAVG('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def d22_grouped_agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D22: TPC-H Q1-shaped grouped aggregate — count/sum/avg over a
    low-cardinality key; classic partial+final hash aggregation."""
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_discount").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "d23_global_agg",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {DSUM('o_totalprice')} AS total,
           {DAVG('o_totalprice')} AS avg_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    """,
)
def d23_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D23: global (no-group) aggregate -> single row."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        dsum("o_totalprice").alias("total"),
        davg("o_totalprice").alias("avg_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "d24_count_distinct",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_distinct_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d24_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D24: multiple DISTINCT aggregates in one pass (Spark expands
    to a multi-phase aggregate automatically)."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.sum_distinct(F.col("l_quantity").cast("decimal(25,6)"))
        .cast("double")
        .alias("sum_distinct_qty"),
        F.count("*").alias("n_lines"),
    )


@query(
    "d25_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_tolerance
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d25_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D25: HyperLogLog++ approximate distinct. The sketch differs
    from DuckDB's, so the sketch VALUE can't be oracle-compared —
    instead the query itself asserts the HLL contract (rsd 0.02,
    checked at 5x slack) and emits a boolean the oracle pins to TRUE:
    a drifting sketch hash-mismatches instead of passing rows-only."""
    l = load(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    tol = (
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        <= 0.10 * F.col("exact_parts")
    )
    return agg.select("l_returnflag", "exact_parts", tol.alias("within_tolerance"))


@query(
    "d26_rollup",
    oracle=f"""
    SELECT COALESCE(r.r_name, '(all)') AS region,
           COALESCE(n.n_name, '(all)') AS nation,
           GROUPING(r.r_name) + GROUPING(n.n_name) AS lvl,
           COUNT(*) AS n_customers,
           {DSUM('c.c_acctbal')} AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def d26_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D26: ROLLUP hierarchy region->nation->grand-total with
    GROUPING() markers (null dims labeled '(all)')."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            (F.grouping("r_name") + F.grouping("n_name")).alias("lvl"),
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation"),
            "lvl",
            "n_customers",
            "total_bal",
        )
    )


@query(
    "d26b_cube",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           COUNT(*) AS n_orders,
           {DSUM('o_totalprice')} AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def d26b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D26: CUBE — all 4 grouping-set combinations."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "d27_conditional_agg",
    oracle=f"""
    SELECT n.n_name AS nation,
           {DSUM("CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice ELSE 0 END")} AS final_rev,
           {DSUM("CASE WHEN o.o_orderstatus <> 'F' THEN o.o_totalprice ELSE 0 END")} AS open_rev,
           COUNT(CASE WHEN o.o_orderpriority = 'URGENT' THEN 1 END) AS n_urgent
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def d27_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D27: FILTER-style conditional aggregation via sum(when(...))."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)
            ).alias("final_rev"),
            dsum(
                F.when(F.col("o_orderstatus") != "F", F.col("o_totalprice")).otherwise(0.0)
            ).alias("open_rev"),
            F.count(F.when(F.col("o_orderpriority") == "URGENT", 1)).alias("n_urgent"),
        )
    )


@query(
    "d28_collect_list_set",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments,
           COUNT(*) AS n_cust
    FROM customer
    GROUP BY c_nationkey
    """,
)
def d28_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D28: collect_set + array_sort for deterministic output.

    The sorted set is surfaced as a '|'-joined string rather than a raw
    array column: harness canonicalizers that sort result rows via
    pandas cannot hash numpy-array cells, while the string form is
    hashable everywhere and preserves the full collect_set semantics.
    """
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias("segments"),
        F.count("*").alias("n_cust"),
    )


# Deterministic two-pass statistical aggregates: the naive sum-of-squares
# formula in exact decimal, identical in both engines (SURVEY §7 risk:
# float stddev/corr are order-dependent, so built-ins won't hash-match).
_STATS_ORACLE = f"""
    WITH s AS (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             {DSUM('o_totalprice')} AS sx,
             {DSUM('o_totalprice * o_totalprice', 4)} AS sxx
      FROM orders
      GROUP BY o_orderstatus
    )
    SELECT o_orderstatus,
           n,
           FLOOR((sxx - sx * sx / n) / (n - 1) * 10000) / 10000 AS var_price,
           FLOOR(SQRT((sxx - sx * sx / n) / (n - 1)) * 10000) / 10000 AS stddev_price
    FROM s
"""


@query("d29_stats_agg", oracle=_STATS_ORACLE)
def d29_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D29: variance/stddev via exact decimal moments (deterministic
    across partitionings, unlike streaming float variance)."""
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    s = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        dsum(price).alias("sx"),
        dsum(price * price, 4).alias("sxx"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)

    # FLOOR-quantization, not ROUND: var/stddev are computed doubles
    # whose shortest rendering can land on a half-boundary where the
    # two engines' ROUND disagree (the d31b divergence class)
    def q4(c):
        return F.floor(c * F.lit(10_000.0)) / F.lit(10_000.0)

    return s.select(
        "o_orderstatus",
        "n",
        q4(var).alias("var_price"),
        q4(F.sqrt(var)).alias("stddev_price"),
    )


@query(
    "d29b_percentile",
    oracle="""
    SELECT l_returnflag,
           FLOOR(quantile_cont(l_quantity, 0.5) * 1000000) / 1000000 AS median_qty,
           FLOOR(quantile_cont(l_quantity, 0.9) * 1000000) / 1000000 AS p90_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d29b_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D29: exact continuous percentile (Spark `percentile` == DuckDB
    `quantile_cont`, both linear interpolation)."""
    l = load(spark, sf_dir, "lineitem")
    # FLOOR-quantization, not ROUND: the interpolated double is a
    # computed value whose shortest rendering can land on a 6th-
    # decimal half-boundary, where Spark's and DuckDB's ROUND
    # disagree (the d31b/e44 divergence class). floor(x*1e6) is the
    # same IEEE product + floor on both engines — unambiguous.
    def q6(c):
        return F.floor(c * F.lit(1_000_000.0)) / F.lit(1_000_000.0)

    return l.groupBy("l_returnflag").agg(
        q6(F.percentile(F.col("l_quantity"), F.lit(0.5))).alias("median_qty"),
        q6(F.percentile(F.col("l_quantity"), F.lit(0.9))).alias("p90_qty"),
    )


@query(
    "d30_latest_per_key",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def d30_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D30: last-per-group via window — the exact in-batch-dedup shape
    the CDC merge uses (SURVEY B6): latest change wins per key."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@query(
    "e07_salted_agg",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n_events, {DSUM('value')} AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def e07_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: two-phase salted aggregation for skewed keys — phase 1
    aggregates on (key, salt) spreading each hot key over 16
    reducers, phase 2 combines the 16 partials per key.

    ``event_type`` has single-digit cardinality, the worst case for a
    direct groupBy at scale (every row of a hot key converges on one
    reducer). The salt bounds any reducer's share of a hot key to
    1/16 of its rows. Exact-decimal partials make the two-phase sum
    bit-equal to the oracle's one-phase sum.
    """
    e = load(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.sum("pv").cast("double").alias("total_value"),
    )


@query(
    "d75_salted_skew_join",
    oracle=f"""
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
                  ELSE l_orderkey % 100 END AS k,
             l_extendedprice
      FROM lineitem
    ),
    dim AS (
      SELECT DISTINCT p_partkey % 100 AS k,
             CAST(p_partkey % 100 AS INT) % 5 AS tier
      FROM part
    )
    SELECT d.tier, COUNT(*) AS n_rows, {DSUM('f.l_extendedprice')} AS revenue
    FROM fact f JOIN dim d ON f.k = d.k
    GROUP BY d.tier
    """,
)
def d75_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 companion to e07: SALTED SHUFFLE JOIN for a skewed fact key.
    The derived fact key sends ~80% of lineitem to k=0 — the shape
    that stalls a shuffle join on one reducer at 100 TB. Fix: fact
    rows get a deterministic salt in [0, 16); the dim side replicates
    16x (dim rows are small — replication is the cheap side); the
    join key becomes (k, salt), spreading the hot key over 16 tasks.
    A ``merge`` hint forces the shuffle-join plan on purpose — with a
    broadcastable dim Spark would broadcast and salting would be
    moot; this operator demonstrates the too-big-to-broadcast case.
    (AQE's skewJoin handles moderate skew automatically at runtime;
    explicit salting is the deterministic, planner-independent form
    for known-pathological keys.) Result is EXACTLY the unsalted
    join (the oracle): salt is derived, dim replication is keyed,
    the aggregate ignores both."""
    SALT = 16
    li = load(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 8, F.lit(0))
        .otherwise(F.col("l_orderkey") % 100)
        .alias("k"),
        "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT)).alias(
            "salt"
        ),
    )
    dim = (
        load(spark, sf_dir, "part")
        .select((F.col("p_partkey") % 100).alias("k"))
        .distinct()
        .withColumn("tier", F.col("k").cast("int") % 5)
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))))
        .withColumn("salt", F.col("salt").cast("bigint"))
    )
    return (
        fact.hint("merge")
        .join(dim, ["k", "salt"])
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("l_extendedprice").alias("revenue"),
        )
    )


@query(
    "d54_pivot",
    oracle=f"""
    SELECT c_mktsegment,
           {DSUM("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS rev_f,
           {DSUM("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS rev_o,
           {DSUM("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS rev_p
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def d54_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order status -> columns of revenue per market segment.
    Explicit value list keeps it one pass (no extra distinct-values
    job) — required at scale, where the implicit form runs a full
    scan just to discover the pivot columns."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum("o_totalprice"))
        .withColumnsRenamed({"F": "rev_f", "O": "rev_o", "P": "rev_p"})
    )


@query(
    "d55_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value
    FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
    FROM customer
    """,
)
def d55_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide columns -> (metric, value) long form — the
    normalization step feeding generic per-metric aggregation. Pure
    projection+generate: no shuffle at all."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")


@query(
    "d62_hll_mergeable_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_tolerance
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d62_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D62: MERGEABLE distinct-count sketches (Apache DataSketches
    HLL, built into Spark 4) — the 100 TB distinct pattern that
    ``COUNT(DISTINCT)`` cannot give: sub-aggregate sketches are built
    per (returnflag, linestatus) cell, then ``hll_union_agg`` ROLLS
    THEM UP to per-returnflag estimates without touching raw rows
    again. At scale the level-1 sketches are what a daily job
    persists; any coarser rollup (weekly, global) is a cheap union of
    kilobyte sketches instead of a re-scan. The sketch estimate can't
    be oracle-compared bit-for-bit (DuckDB's HLL differs), so the
    query asserts the HLL contract itself — lgK=12 gives rsd ~1.6%,
    checked at 5x slack — and emits a boolean the oracle pins TRUE."""
    l = load(spark, sf_dir, "lineitem")
    lv1 = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    merged = lv1.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_parts")
    )
    exact = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    j = merged.join(exact, "l_returnflag")
    tol = (
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        <= 0.08 * F.col("exact_parts")
    )
    return j.select("l_returnflag", "exact_parts", tol.alias("within_tolerance"))


@query(
    "d63_kll_quantile_sketch",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           TRUE AS q50_within, TRUE AS q95_within
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d63_kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D63: KLL quantile sketches (DataSketches) — streaming/mergeable
    quantiles for 100 TB columns where exact ``percentile`` would sort
    the world. The estimate is validated by its own contract: the
    NORMALIZED RANK of the estimated quantile must sit within the
    sketch's rank-error bound (k=200 -> ~1.65% one-sided; checked at
    ~3x slack, 5%). Rank is checked by a self-join counting rows below
    the estimate — exactly how a deployment audits a sketch before
    trusting it — and the oracle pins the booleans TRUE."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("double").alias("q")
    )
    sk = l.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("q").alias("sk"), F.count("*").alias("n_rows")
    )
    est = sk.select(
        "l_returnflag",
        "n_rows",
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5)).alias("q50"),
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.95)).alias("q95"),
    )
    ranks = (
        l.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            (F.sum((F.col("q") <= F.col("q50")).cast("long")) / F.first("n_rows")).alias("r50"),
            (F.sum((F.col("q") <= F.col("q95")).cast("long")) / F.first("n_rows")).alias("r95"),
            F.first("n_rows").alias("n_rows"),
        )
    )
    return ranks.select(
        "l_returnflag",
        "n_rows",
        (F.abs(F.col("r50") - 0.5) <= 0.05).alias("q50_within"),
        (F.abs(F.col("r95") - 0.95) <= 0.05).alias("q95_within"),
    )


@query(
    "d29c_median_mode",
    oracle="""
    WITH cents AS (
      SELECT c_mktsegment, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      FROM customer
    ),
    freq AS (
      SELECT c_mktsegment, bal, COUNT(*) AS n FROM cents GROUP BY c_mktsegment, bal
    ),
    modes AS (
      SELECT c_mktsegment, bal AS mode_bal FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                     ORDER BY n DESC, bal) AS rn
        FROM freq
      ) WHERE rn = 1
    )
    SELECT c.c_mktsegment,
           MEDIAN(bal) / 100.0 AS median_bal,
           QUANTILE_CONT(bal, 0.25) / 100.0 AS p25_bal,
           QUANTILE_CONT(bal, 0.75) / 100.0 AS p75_bal,
           m.mode_bal / 100.0 AS mode_bal,
           COUNT(*) AS n_rows
    FROM cents c JOIN modes m USING (c_mktsegment)
    GROUP BY c.c_mktsegment, m.mode_bal
    """,
)
def d29c_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D29 companion: exact median / quartiles / deterministic mode.
    Determinism: interpolated percentiles over DOUBLE diverge between
    engines at representation boundaries, so values quantize to cents
    (exact BIGINTs) first — interpolation then happens on integers,
    where the .5 midpoints are exact in IEEE doubles and the /100
    rescale performs the identical operation on both sides. Spark's
    mode() breaks frequency ties arbitrarily, so the mode is computed
    explicitly (count + row_number with a (freq DESC, value) order) —
    one extra shuffle of (segment, value) count cells, nothing
    row-scale. percentile() is an exact sort-based aggregate within
    each segment: fine at segment cardinality, the documented trade
    vs the mergeable KLL sketch (d63) at unbounded cardinality."""
    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal"),
    )
    freq = c.groupBy("c_mktsegment", "bal").agg(F.count("*").alias("n"))
    wm = W.partitionBy("c_mktsegment").orderBy(F.col("n").desc(), "bal")
    modes = (
        freq.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("c_mktsegment", F.col("bal").alias("mode_bal"))
    )
    stats = c.groupBy("c_mktsegment").agg(
        (F.median("bal") / 100.0).alias("median_bal"),
        (F.percentile("bal", F.lit(0.25)) / 100.0).alias("p25_bal"),
        (F.percentile("bal", F.lit(0.75)) / 100.0).alias("p75_bal"),
        F.count("*").alias("n_rows"),
    )
    return stats.join(F.broadcast(modes), "c_mktsegment").select(
        "c_mktsegment",
        "median_bal",
        "p25_bal",
        "p75_bal",
        (F.col("mode_bal") / 100.0).alias("mode_bal"),
        "n_rows",
    )


#: count-min geometry: CM_D independent hash rows x CM_W buckets.
#: Keys are token BIGRAMS (~vocab^2 types on the fixture) and the
#: bucket space is kept SMALLER than the key space on purpose, so the
#: sketch actually collides and the overestimate column exercises the
#: CM contract — a sketch wider than its key universe is just an
#: exact table wearing a costume.
CM_D = 4
CM_W = 256
_CM_M31 = 2_147_483_647
_CM_AFFINE = [(104_729 + 10 * r, 224_737 + 3 * r) for r in range(CM_D)]


@query(
    "d89_countmin_heavy_hitters",
    oracle=f"""
    WITH t AS (
      SELECT string_split(LOWER(text), ' ') AS t FROM documents
    ),
    tok AS (
      SELECT bg AS token,
             ('0x' || substr(md5(bg), 1, 15))::BIGINT % {_CM_M31} AS th
      FROM (
        SELECT UNNEST(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS bg
        FROM t WHERE len(t) >= 2
      )
    ),
    cells AS (
      {' UNION ALL '.join(
          f"SELECT {r} AS r, (({a} * th + {b}) % {_CM_M31}) % {CM_W} AS bkt, token FROM tok"
          for r, (a, b) in enumerate(_CM_AFFINE)
      )}
    ),
    counters AS (
      SELECT r, bkt, COUNT(*) AS c FROM cells GROUP BY r, bkt
    ),
    exact AS (
      SELECT token, th, COUNT(*) AS true_count
      FROM tok GROUP BY token, th
      ORDER BY true_count DESC, token LIMIT 20
    ),
    probes AS (
      SELECT token, true_count, r.r AS r,
             (({'(CASE '
                + ' '.join(f"WHEN r.r = {i} THEN {a} * th + {b}" for i, (a, b) in enumerate(_CM_AFFINE))
                + ' END)'}) % {_CM_M31}) % {CM_W} AS bkt
      FROM exact, (SELECT UNNEST(range(0, {CM_D})) AS r) r
    )
    SELECT p.token, p.true_count,
           CAST(MIN(c.c) AS BIGINT) AS cm_estimate,
           CAST(MIN(c.c) - p.true_count AS BIGINT) AS overestimate
    FROM probes p JOIN counters c ON p.r = c.r AND p.bkt = c.bkt
    GROUP BY p.token, p.true_count
    """,
)
def d89_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-family sketch #3 (with d62 HLL, d63 KLL): COUNT-MIN heavy
    hitters — estimate token-BIGRAM frequencies from a fixed CM_D x CM_W (default 4x256)
    counter grid (Cormode & Muthukrishnan 2005, public) and audit the
    estimate against the exact counts of the top-20 tokens. The CM
    contract (estimate >= truth, overestimate bounded by collisions)
    is IN the output as an `overestimate` column, and — unlike d62/
    d63's tolerance oracles — the whole thing hash-matches exactly:
    both engines build identical integer counters from identical
    portable hashes (md5-prefix base, affine row permutations, the
    e02 discipline).

    Scale: the sketch is the point — the counter grid is CM_D x CM_W
    cells REGARDLESS of corpus size, built in one partial-aggregated
    pass (each mapper combines locally into at most D x W cells before
    the shuffle), mergeable across shards/days by cell-wise addition,
    and queryable for any key without re-scanning. The exact side here
    is the audit, not the product. One token shuffle for truth, one
    bounded-cell shuffle for the sketch."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    tok = (
        fan_out(d)
        .select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("t", i), F.element_at("t", i + 1)
                    ),
                )
            ).alias("token")
        )
        .select(
            "token",
            F.pmod(mh64("token"), F.lit(_CM_M31)).alias("th"),
        )
    )
    bucket_cols = [
        F.pmod(
            F.pmod(F.lit(a) * F.col("th") + F.lit(b), F.lit(_CM_M31)),
            F.lit(CM_W),
        ).alias(f"b_{r}")
        for r, (a, b) in enumerate(_CM_AFFINE)
    ]
    counters = (
        tok.select(F.posexplode(F.array(*bucket_cols)).alias("r", "bkt"))
        .groupBy("r", "bkt")
        .agg(F.count("*").alias("c"))
    )
    exact = (
        tok.groupBy("token", "th")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), "token")
        .limit(20)
    )
    probes = exact.select(
        "token",
        "true_count",
        F.posexplode(F.array(*bucket_cols)).alias("r", "bkt"),
    )
    return (
        probes.join(F.broadcast(counters), ["r", "bkt"])
        .groupBy("token", "true_count")
        .agg(
            F.min("c").cast("bigint").alias("cm_estimate"),
            (F.min("c") - F.col("true_count")).cast("bigint").alias("overestimate"),
        )
    )


#: KMV sketch size (bottom-k minimum hash values per group)
KMV_K = 128
#: hash domain: 15 hex digits of md5 -> uniform in [0, 16^15) = [0, 2^60)
KMV_DOMAIN = 16 ** 15


@query(
    "d101_kmv_set_intersection",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT o_orderstatus AS grp,
             ('0x' || substr(md5('kmv|' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM orders
    ), sk AS (
      SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
      FROM h
    ), keep AS (SELECT grp, h FROM sk WHERE rn <= {KMV_K}),
    kth AS (
      SELECT grp, MAX(h) AS hk, COUNT(*) AS k FROM keep GROUP BY grp
    ), est AS (
      SELECT grp, k, hk,
             CASE WHEN k < {KMV_K} THEN k
                  ELSE (((k - 1)::HUGEINT * {KMV_DOMAIN}::HUGEINT)
                        // hk::HUGEINT)::BIGINT END AS est_distinct
      FROM kth
    ), pairs AS (
      SELECT a.grp AS grp_a, b.grp AS grp_b,
             a.est_distinct AS est_a, b.est_distinct AS est_b
      FROM est a JOIN est b ON a.grp < b.grp
    ), pool AS (
      SELECT DISTINCT p.grp_a, p.grp_b, keep.h
      FROM pairs p JOIN keep ON keep.grp IN (p.grp_a, p.grp_b)
    ), uni AS (
      SELECT grp_a, grp_b, h,
             ROW_NUMBER() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rn
      FROM pool
    ), usk AS (SELECT grp_a, grp_b, h FROM uni WHERE rn <= {KMV_K}),
    ustats AS (
      SELECT u.grp_a, u.grp_b,
             MAX(u.h) AS uhk, COUNT(*) AS uk,
             COUNT(*) FILTER (ka.h IS NOT NULL AND kb.h IS NOT NULL) AS matches
      FROM usk u
      LEFT JOIN keep ka ON ka.grp = u.grp_a AND ka.h = u.h
      LEFT JOIN keep kb ON kb.grp = u.grp_b AND kb.h = u.h
      GROUP BY u.grp_a, u.grp_b
    ), ustats2 AS (
      SELECT grp_a, grp_b, uk, matches,
             CASE WHEN uk < {KMV_K} THEN uk
                  ELSE (((uk - 1)::HUGEINT * {KMV_DOMAIN}::HUGEINT)
                        // uhk::HUGEINT)::BIGINT END AS est_union
      FROM ustats
    ), exact AS (
      SELECT p.grp_a, p.grp_b, COUNT(*) AS exact_inter
      FROM pairs p
      JOIN (SELECT DISTINCT o_orderstatus AS grp, o_custkey AS cust FROM orders) xa
        ON xa.grp = p.grp_a
      JOIN (SELECT DISTINCT o_orderstatus AS grp, o_custkey AS cust FROM orders) xb
        ON xb.grp = p.grp_b AND xb.cust = xa.cust
      GROUP BY p.grp_a, p.grp_b
    )
    SELECT p.grp_a, p.grp_b,
           CAST(p.est_a AS BIGINT) AS est_a,
           CAST(p.est_b AS BIGINT) AS est_b,
           CAST(s.est_union AS BIGINT) AS est_union,
           ((s.matches::HUGEINT * s.est_union::HUGEINT)
            // s.uk::HUGEINT)::BIGINT AS est_inter,
           CAST(COALESCE(e.exact_inter, 0) AS BIGINT) AS exact_inter
    FROM pairs p
    JOIN ustats2 s ON s.grp_a = p.grp_a AND s.grp_b = p.grp_b
    LEFT JOIN exact e ON e.grp_a = p.grp_a AND e.grp_b = p.grp_b
    """,
)
def d101_kmv_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D62's missing verb: KMV (bottom-k minimum values) sketches
    with set-INTERSECTION estimation — the operation HLL cannot
    express (public sketch: Bar-Yossef et al. 2002 / the theta-sketch
    intersection shape). Per order status, the sketch is the K
    smallest md5 hashes of the distinct customer keys; distinct-count
    estimate is (K-1)·domain/h_K (exact when the group fits in the
    sketch); pairwise intersections come from the UNION sketch
    (bottom-K of the two sketches' union) via the match fraction —
    mergeable state, so sketches combine across partitions, days, or
    sources without re-reading raw data. All arithmetic is exact
    BIGINT (floor divisions on md5-derived integers), so estimates
    hash-match cross-engine. ``exact_inter`` (a real distinct
    self-join) rides along as evaluation-only ground truth — at
    100 TB you keep the sketches and drop that column.

    Plan: one distinct + one bottom-K window per group (the window
    partitions by group — K rows retained each), pair expansion over
    the GROUP list (3 statuses -> 3 pairs), and all sketch math on
    K-row frames. The raw table is read twice (sketch + ground
    truth); a production run reads it once."""
    o = load(spark, sf_dir, "orders")
    h = (
        o.select(
            F.col("o_orderstatus").alias("grp"),
            mh64(
                F.concat(F.lit("kmv|"), F.col("o_custkey").cast("string"))
            ).alias("h"),
        )
        .distinct()
    )
    keep = (
        h.withColumn("rn", F.row_number().over(W.partitionBy("grp").orderBy("h")))
        .filter(F.col("rn") <= KMV_K)
        .select("grp", "h")
    )
    kth = keep.groupBy("grp").agg(F.max("h").alias("hk"), F.count("*").alias("k"))
    # exact integer floor division on both engines (DECIMAL(38,0) DIV
    # here, HUGEINT // in the oracle): (k-1)*2^60 exceeds both 2^53
    # (double mantissa) and 2^63, so double math would be a latent
    # cross-engine divergence at larger domains (ADVICE r6 #4).
    est_expr = F.when(F.col("k") < KMV_K, F.col("k")).otherwise(
        F.expr(
            f"CAST((CAST(k - 1 AS DECIMAL(38,0)) * {KMV_DOMAIN}) DIV hk AS BIGINT)"
        )
    )
    est = kth.select("grp", est_expr.alias("est_distinct"))
    a = est.select(F.col("grp").alias("grp_a"), F.col("est_distinct").alias("est_a"))
    b = est.select(F.col("grp").alias("grp_b"), F.col("est_distinct").alias("est_b"))
    pairs = a.join(b, F.col("grp_a") < F.col("grp_b"))
    pool = (
        pairs.select("grp_a", "grp_b")
        .join(
            keep,
            (F.col("grp") == F.col("grp_a")) | (F.col("grp") == F.col("grp_b")),
        )
        .select("grp_a", "grp_b", "h")
        .distinct()
    )
    usk = (
        pool.withColumn(
            "rn", F.row_number().over(W.partitionBy("grp_a", "grp_b").orderBy("h"))
        )
        .filter(F.col("rn") <= KMV_K)
        .select("grp_a", "grp_b", "h")
    )
    ka = keep.select(F.col("grp").alias("grp_a"), F.col("h").alias("h"), F.lit(1).alias("in_a"))
    kb = keep.select(F.col("grp").alias("grp_b"), F.col("h").alias("h"), F.lit(1).alias("in_b"))
    ustats = (
        usk.join(ka, ["grp_a", "h"], "left")
        .join(kb, ["grp_b", "h"], "left")
        .groupBy("grp_a", "grp_b")
        .agg(
            F.max("h").alias("uhk"),
            F.count("*").alias("uk"),
            F.count(F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1)).alias("matches"),
        )
    )
    uest = F.when(F.col("uk") < KMV_K, F.col("uk")).otherwise(
        F.expr(
            f"CAST((CAST(uk - 1 AS DECIMAL(38,0)) * {KMV_DOMAIN}) DIV uhk AS BIGINT)"
        )
    )
    distinct_gc = o.select(
        F.col("o_orderstatus").alias("grp"), F.col("o_custkey").alias("cust")
    ).distinct()
    xa = distinct_gc.select(F.col("grp").alias("grp_a"), "cust")
    xb = distinct_gc.select(F.col("grp").alias("grp_b"), "cust")
    exact = (
        pairs.select("grp_a", "grp_b")
        .join(xa, "grp_a")
        .join(xb, ["grp_b", "cust"])
        .groupBy("grp_a", "grp_b")
        .agg(F.count("*").alias("exact_inter"))
    )
    ustats2 = ustats.withColumn("est_union", uest.cast("long"))
    return (
        pairs.join(ustats2, ["grp_a", "grp_b"])
        .join(exact, ["grp_a", "grp_b"], "left")
        .select(
            "grp_a",
            "grp_b",
            F.col("est_a").cast("long").alias("est_a"),
            F.col("est_b").cast("long").alias("est_b"),
            "est_union",
            F.expr(
                "CAST((CAST(matches AS DECIMAL(38,0)) * est_union) DIV uk AS BIGINT)"
            ).alias("est_inter"),
            F.coalesce(F.col("exact_inter"), F.lit(0)).cast("long").alias("exact_inter"),
        )
    )
