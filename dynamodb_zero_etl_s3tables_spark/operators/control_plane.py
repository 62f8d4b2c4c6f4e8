"""Control-plane computations re-expressed as data operators
(SURVEY.md §2 A-rows).

The reference's Lambda performs a keyed read-modify-write over policy
statements: drop statements whose Sid is ours, append ours, write back
(reference lambda/catalog-policy-handler.js:39-71, filter at :52,
merge at :55). That is exactly anti-join + union — the same shape as
the CDC upsert — so it's modeled here on a keyed statement DataFrame
derived deterministically from the nation table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.operators.registry import query
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load


@query(
    "a04_sanitize_identifier",
    oracle="""
    SELECT c_custkey,
           REGEXP_REPLACE(c_name, '[^a-zA-Z0-9]', '', 'g') AS sid_prefix
    FROM customer
    """,
)
def a04_sanitize_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: strip non-alphanumerics — the reference's Sid-prefix
    sanitizer (``replace(/[^a-zA-Z0-9]/g, '')``, reference
    src/dynamodb-zero-etl-s3tables.ts:74), vectorized."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[^a-zA-Z0-9]", "").alias("sid_prefix"),
    )


def _policy_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic 'existing policy' / 'our statements' fixtures
    (FIXTURES.md §B.3): existing = all 25 nations as statements; ours =
    nations of region 0 plus two region-2 rewrites, with new bodies."""
    n = load(spark, sf_dir, "nation")
    existing = n.select(
        F.concat(F.lit("Sid"), F.col("n_nationkey")).alias("sid"),
        F.concat(F.lit("allow:"), F.col("n_name")).alias("body"),
    )
    ours = (
        n.filter((F.col("n_regionkey") == 0) | (F.col("n_nationkey") % 7 == 2))
        .select(
            F.concat(F.lit("Sid"), F.col("n_nationkey")).alias("sid"),
            F.concat(F.lit("updated:"), F.col("n_name")).alias("body"),
        )
    )
    return existing, ours


_POLICY_CTE = """
    WITH existing AS (
      SELECT 'Sid' || n_nationkey AS sid, 'allow:' || n_name AS body FROM nation
    ), ours AS (
      SELECT 'Sid' || n_nationkey AS sid, 'updated:' || n_name AS body
      FROM nation WHERE n_regionkey = 0 OR n_nationkey % 7 = 2
    )
"""


@query(
    "a06_policy_merge",
    oracle=_POLICY_CTE
    + """
    SELECT sid, body FROM existing e
    WHERE NOT EXISTS (SELECT 1 FROM ours o WHERE o.sid = e.sid)
    UNION ALL
    SELECT sid, body FROM ours
    """,
)
def a06_policy_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: keyed statement merge (upsert) — anti-join out our Sids,
    then append ours (reference lambda :52-:55). Idempotent: applying
    twice yields the same state (A10)."""
    existing, ours = _policy_frames(spark, sf_dir)
    return existing.join(ours, "sid", "left_anti").unionByName(ours)


@query(
    "a07_policy_delete",
    oracle=_POLICY_CTE
    + """
    SELECT sid, body FROM existing e
    WHERE NOT EXISTS (SELECT 1 FROM ours o WHERE o.sid = e.sid)
    """,
)
def a07_policy_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: keyed statement delete — drop our Sids (reference lambda
    :62-:71)."""
    existing, ours = _policy_frames(spark, sf_dir)
    return existing.join(ours, "sid", "left_anti")


@query(
    "a03_identifier_derivation",
    oracle="""
    SELECT n_nationkey,
           'arn:aws:s3tables:' || LOWER(r_name) || ':' || n_nationkey
             || ':bucket/' || LOWER(n_name) AS bucket_arn,
           LOWER(n_name) || '/' || 'ns' || n_regionkey AS table_path
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def a03_identifier_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: templated identifier derivation (the ARN templating at
    reference ts:68-73) as vectorized string construction."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return j.select(
        "n_nationkey",
        F.concat(
            F.lit("arn:aws:s3tables:"),
            F.lower("r_name"),
            F.lit(":"),
            F.col("n_nationkey").cast("string"),
            F.lit(":bucket/"),
            F.lower("n_name"),
        ).alias("bucket_arn"),
        F.concat(
            F.lower("n_name"), F.lit("/"), F.lit("ns"), F.col("n_regionkey").cast("string")
        ).alias("table_path"),
    )
