"""Scalar function surface (SURVEY.md §2 D42-D48): string, date/time,
math, array, map, JSON, hash families. These power the attribute-value
decode (B3) and the general Athena-style SQL surface.

All expressions are JVM-side built-ins (whole-stage codegen); no
Python UDFs anywhere in these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_zero_etl_s3tables_spark.operators.registry import query
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load


@query(
    "d42_string_fns",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT_WS('|', c_name, c_mktsegment) AS joined,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           TRIM('  ' || c_name || ' ') AS trimmed,
           REPLACE(c_name, '#', '-') AS dashed,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits,
           REGEXP_REPLACE(c_name, '[0-9]', 'x', 'g') AS masked,
           SPLIT_PART(c_name, '#', 1) AS first_token,
           REVERSE(c_mktsegment) AS seg_rev
    FROM customer
    """,
)
def d42_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D42: string family — concat/substr/pad/trim/regex/split."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "x").alias("masked"),
        F.split(F.col("c_name"), "#").getItem(0).alias("first_token"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
    )


@query(
    "d43_datetime_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS odate,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mo,
           DAY(o_orderdate) AS dom,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(DATE_TRUNC('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS epoch_sec,
           DAYOFWEEK(o_orderdate) + 1 AS dow,  -- DuckDB Sunday=0; Spark Sunday=1
           WEEKOFYEAR(o_orderdate) AS woy,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def d43_datetime_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D43: date/time family — trunc, parts, arithmetic, epoch."""
    o = load(spark, sf_dir, "orders")
    odate = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        odate.cast("timestamp").alias("odate"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.date_add(odate, 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), odate).alias("days_to_2002"),
        F.col("o_orderdate").cast("timestamp").cast("long").alias("epoch_sec"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.last_day(odate).cast("timestamp").alias("month_end"),
    )


@query(
    "d44_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           ABS(l_discount - 0.05) AS disc_dev,
           ROUND(POW(l_quantity, 2), 6) AS qty_sq,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
           MOD(CAST(l_orderkey AS BIGINT), 7) AS key_mod7,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           GREATEST(l_quantity, 25.0) AS qty_hi,
           LEAST(l_quantity, 25.0) AS qty_lo,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def d44_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D44: math family; transcendentals rounded to 6dp (libm results
    agree to well beyond 6dp across engines)."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_lo"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
    )


@query(
    "d45_array_fns",
    oracle="""
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           list_contains(toks, 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_csv,
           len(list_filter(toks, t -> LENGTH(t) > 4)) AS n_long,
           array_to_string(list_sort(list_transform(list_distinct(toks), t -> UPPER(t))), ',') AS upper_toks
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
)
def d45_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D45: array family incl. higher-order transform/filter over
    tokenized documents (JVM-side lambda functions, not UDFs).

    Array-valued intermediates are surfaced via ``array_join`` so every
    output column is scalar-hashable by external harnesses (see d28).
    """
    d = load(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    distinct_sorted = F.array_sort(F.array_distinct(F.col("toks")))
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.array_join(F.slice(distinct_sorted, 1, 3), ",").alias("first3_csv"),
        F.size(F.filter("toks", lambda t: F.length(t) > 4)).alias("n_long"),
        F.array_join(
            F.array_sort(F.transform(F.array_distinct("toks"), lambda t: F.upper(t))),
            ",",
        ).alias("upper_toks"),
    )


@query(
    "d45b_explode",
    oracle="""
    SELECT token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def d45b_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D45: explode -> token frequencies (generator + re-aggregate;
    the token-count backbone reused by the E5 text ops)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"), F.countDistinct("doc_id").alias("df"))
    )


@query(
    "d46_map_fns",
    oracle="""
    SELECT event_id,
           MAP(['type','bucket'], [event_type, CASE WHEN value >= 100 THEN 'big' ELSE 'small' END])['type'][1]
             AS m_type,
           MAP(['type','bucket'], [event_type, CASE WHEN value >= 100 THEN 'big' ELSE 'small' END])['bucket'][1]
             AS m_bucket,
           CARDINALITY(MAP(['type','bucket'], [event_type, 'x'])) AS m_size
    FROM events
    """,
)
def d46_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D46: map construction + element_at + cardinality, surfaced as
    scalars (map *values* cross-engine, map *types* don't hash
    portably, so outputs are extracted fields)."""
    e = load(spark, sf_dir, "events")
    bucket = F.when(F.col("value") >= 100, "big").otherwise("small")
    m = F.create_map(F.lit("type"), F.col("event_type"), F.lit("bucket"), bucket)
    m2 = F.create_map(F.lit("type"), F.col("event_type"), F.lit("bucket"), F.lit("x"))
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "bucket").alias("m_bucket"),
        F.size(m2).alias("m_size"),
    )


@query(
    "d47_json_fns",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_value,
           CAST(json_extract(props, '$.missing') AS VARCHAR) IS NULL AS missing_is_null,
           json_valid(props) AS is_valid
    FROM events
    """,
)
def d47_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D47: JSON path extraction over the events.props JSON string
    (the ad-hoc path access mode of the attribute-value decode B3)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
        F.from_json("props", T.MapType(T.StringType(), T.StringType()))
        .isNotNull()
        .alias("is_valid"),
    )


@query(
    "d48_hash_fns",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           LEFT(md5(c_name), 8) AS short_hash
    FROM customer
    """,
)
def d48_hash_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D48: cryptographic hashes (hex-identical across engines; these
    power exact dedup E1 and the driver's own row-hash)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.substring(F.md5("c_name"), 1, 8).alias("short_hash"),
    )


@query(
    "d48b_hash_native",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT c_name) AS n_distinct_names,
           TRUE AS xxhash64_injective,
           TRUE AS murmur3_low_collision,
           TRUE AS crc32_low_collision
    FROM customer
    """,
)
def d48b_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D48: Spark-native hashes (xxhash64 / murmur3 / crc32). Their
    VALUES are engine-specific, so the oracle checks hash-function
    INVARIANTS the query asserts about itself: 64-bit xxhash must be
    collision-free on this cardinality (collision odds ~1e-11), and
    the 32-bit families must stay within birthday-bound slack (1%).
    A broken hash column flips a boolean and hash-mismatches."""
    c = load(spark, sf_dir, "customer")
    h = c.select(
        "c_name",
        F.xxhash64("c_name").alias("xx"),
        F.hash("c_name").alias("mm"),
        F.crc32(F.col("c_name").cast("binary")).alias("crc"),
    )
    return h.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("c_name").alias("n_distinct_names"),
        (F.countDistinct("xx") == F.countDistinct("c_name")).alias(
            "xxhash64_injective"
        ),
        (
            F.countDistinct("mm").cast("double")
            >= 0.99 * F.countDistinct("c_name")
        ).alias("murmur3_low_collision"),
        (
            F.countDistinct("crc").cast("double")
            >= 0.99 * F.countDistinct("c_name")
        ).alias("crc32_low_collision"),
    )


#: CPU scaling probe shape: customer x FANOUT exploded rows, each
#: hashed through an ITERS-deep md5 chain. The scan is tiny (customer)
#: so the serial fraction is job constants only; the chain work is
#: embarrassingly parallel across the exploded rows — measured r11:
#: the first lineitem-scan draft had a ~1s serial scan+repartition
#: floor and scaled only 1.5x from 8->32 cores; this shape scales
#: ~2.5-3x, which is what makes the driver's low-core axis readable.
_CPU_PROBE_ITERS = 96
_CPU_PROBE_FANOUT = 40


def _md5_chain_sql(expr: str, n: int) -> str:
    for _ in range(n):
        expr = f"md5({expr})"
    return expr


@query(
    "d48c_cpu_scaling_probe",
    oracle=f"""
    SELECT flag, COUNT(*) AS n, bit_xor(hd) AS hxor
    FROM (
      SELECT c_mktsegment AS flag,
             (('0x' || substr({_md5_chain_sql(
                 "CAST(c_custkey AS VARCHAR) || '|' || CAST(i AS VARCHAR)",
                 _CPU_PROBE_ITERS,
             )}, 1, 15))::BIGINT) AS hd
      FROM customer,
           (SELECT UNNEST(range(1, {_CPU_PROBE_FANOUT + 1})) AS i)
    )
    GROUP BY 1
    """,
)
def d48c_cpu_scaling_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D48c (r11, VERDICT r10 #2): a deliberately CPU-SCALABLE probe
    for the driver's low-core bench axis. Every other headline query
    at sf0.1 is dominated by fixed costs (job launch, commit
    machinery, microbatch floors), so the 8-core/32-core ratio reads
    ~1 everywhere and the scaling measurement is uninterpretable; this
    query is pure per-row compute — each customer row explodes into
    _CPU_PROBE_FANOUT rows, each hashed through a _CPU_PROBE_ITERS-deep
    md5 chain — sequential per row, embarrassingly parallel across rows
    (``fan_out`` spreads the single sf0.1 parquet split over the
    cores), with a 5-row aggregate on top. Its 8c/32c ratio tracks
    the core count, mechanically separating "machinery floor" from
    "serial operator" on the scaling axis. The oracle replays the
    identical chain in DuckDB (md5 hex is engine-portable, proven by
    d48)."""
    from dynamodb_zero_etl_s3tables_spark.operators.registry import fan_out

    c = fan_out(
        load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    rows = c.select(
        F.col("c_mktsegment").alias("flag"),
        F.col("c_custkey"),
        F.explode(F.sequence(F.lit(1), F.lit(_CPU_PROBE_FANOUT))).alias("i"),
    )
    h = F.concat_ws(
        "|", F.col("c_custkey").cast("string"), F.col("i").cast("string")
    )
    for _ in range(_CPU_PROBE_ITERS):
        h = F.md5(h)
    # numeric 60-bit digest + bit_xor: fixed-width aggregate buffer so
    # the plan stays HashAggregate (min/max over the hex STRING would
    # demote to SortAggregate — the registry-wide plan gate forbids it)
    hd = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    return (
        rows.select("flag", hd.alias("hd"))
        .groupBy("flag")
        .agg(F.count("*").alias("n"), F.bit_xor("hd").alias("hxor"))
    )

