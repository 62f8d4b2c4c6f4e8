"""Ingest/CDC data-plane operators, batch form (SURVEY.md §2 B1-B7).

B3 decode: the PITR export the reference's grant produces
(dynamodb:ExportTableToPointInTime, reference ts:135) is DynamoDB
attribute-value JSON — ``{"PK":{"S":"..."},"value":{"N":"3"}}``. The
query below *constructs* that wire form from events rows with
identical string ops in both engines, then decodes it back to typed
columns, so the decode logic is what the oracle checks.

B5-B7 merge: deterministic changelog derived from orders; the Spark
side runs the engine's real merge (table.merge.merge_changes), the
oracle replays the same semantics in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.operators.registry import query
from dynamodb_zero_etl_s3tables_spark.operators.scratch import scratch_dir
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load
from dynamodb_zero_etl_s3tables_spark.table.merge import merge_changes


@query(
    "b03_attrvalue_decode",
    oracle="""
    WITH wire AS (
      SELECT event_id,
             '{"PK":{"S":"USER#' || user_id || '"},"SK":{"S":"EVT#' || event_id
               || '"},"etype":{"S":"' || event_type
               || '"},"value":{"N":"' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR)
               || '"},"flag":{"BOOL":' || CASE WHEN value >= 100 THEN 'true' ELSE 'false' END
               || '},"missing":{"NULL":true}}' AS item_json
      FROM events
    )
    SELECT event_id,
           item_json,
           json_extract_string(item_json, '$.PK.S') AS pk,
           json_extract_string(item_json, '$.SK.S') AS sk,
           CAST(REPLACE(json_extract_string(item_json, '$.PK.S'), 'USER#', '') AS BIGINT)
             AS decoded_user,
           json_extract_string(item_json, '$.etype.S') AS decoded_type,
           CAST(CAST(json_extract_string(item_json, '$.value.N') AS DECIMAL(12,2)) AS DOUBLE)
             AS decoded_value,
           CAST(json_extract_string(item_json, '$.flag.BOOL') AS BOOLEAN) AS decoded_flag,
           json_extract_string(item_json, '$.value.S') IS NULL AS n_not_s
    FROM wire
    """,
)
def b03_attrvalue_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: DynamoDB attribute-value encode->decode round trip, all
    JVM-side string/JSON built-ins (the full file-based codec with
    from_json schemas lives in functions/decode.py; the file-based
    export round trip is d02_json_scan in sources_sinks.py)."""
    e = load(spark, sf_dir, "events")
    val_str = F.col("value").cast("decimal(12,2)").cast("string")
    item_json = F.concat(
        F.lit('{"PK":{"S":"USER#'),
        F.col("user_id").cast("string"),
        F.lit('"},"SK":{"S":"EVT#'),
        F.col("event_id").cast("string"),
        F.lit('"},"etype":{"S":"'),
        F.col("event_type"),
        F.lit('"},"value":{"N":"'),
        val_str,
        F.lit('"},"flag":{"BOOL":'),
        F.when(F.col("value") >= 100, "true").otherwise("false"),
        F.lit('},"missing":{"NULL":true}}'),
    )
    wire = e.select("event_id", item_json.alias("item_json"))
    pk = F.get_json_object("item_json", "$.PK.S")
    return wire.select(
        "event_id",
        "item_json",
        pk.alias("pk"),
        F.get_json_object("item_json", "$.SK.S").alias("sk"),
        F.replace(pk, F.lit("USER#"), F.lit("")).cast("bigint").alias("decoded_user"),
        F.get_json_object("item_json", "$.etype.S").alias("decoded_type"),
        F.get_json_object("item_json", "$.value.N")
        .cast("decimal(12,2)")
        .cast("double")
        .alias("decoded_value"),
        F.get_json_object("item_json", "$.flag.BOOL").cast("boolean").alias("decoded_flag"),
        F.get_json_object("item_json", "$.value.S").isNull().alias("n_not_s"),
    )


# --- deterministic base/changelog fixtures (FIXTURES.md §B.2) -------------
#
# base      : orders with o_orderkey % 10 <= 7       (the bootstrapped table)
# changelog : MODIFY  %10 in (0,1)  -> price * 1.1   (seq 1)
#             MODIFY  %10 = 0       -> price * 1.2   (seq 2, same key — B6)
#             REMOVE  %10 = 2
#             INSERT  %10 in (8,9)  -> brand-new keys
# expected  : %10 in (0)      -> price*1.2   (latest in-batch change wins)
#             %10 in (1)      -> price*1.1
#             %10 = 2         -> gone
#             %10 in (3..7)   -> untouched
#             %10 in (8,9)    -> inserted

_MERGE_CTE = """
    WITH base AS (
      SELECT o_orderkey AS pk, o_orderstatus AS status, o_totalprice AS price
      FROM orders WHERE o_orderkey % 10 <= 7
    ), changelog AS (
      SELECT 'MODIFY' AS op, 1 AS seq, o_orderkey AS pk, o_orderstatus AS status,
             CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 10 IN (0, 1)
      UNION ALL
      SELECT 'MODIFY' AS op, 2 AS seq, o_orderkey AS pk, o_orderstatus AS status,
             CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.2 AS DECIMAL(3,1)), 2) AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT 'REMOVE' AS op, 1 AS seq, o_orderkey AS pk, o_orderstatus AS status,
             o_totalprice AS price
      FROM orders WHERE o_orderkey % 10 = 2
      UNION ALL
      SELECT 'INSERT' AS op, 1 AS seq, o_orderkey AS pk, o_orderstatus AS status,
             o_totalprice AS price
      FROM orders WHERE o_orderkey % 10 IN (8, 9)
    ), latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) AS rn
        FROM changelog
      ) WHERE rn = 1
    )
"""


def _merge_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load(spark, sf_dir, "orders")
    mod10 = F.col("o_orderkey") % 10
    base = o.filter(mod10 <= 7).select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )

    def chg(op: str, seq: int, cond, price_col):
        return o.filter(cond).select(
            F.lit(op).alias("op"),
            F.lit(seq).alias("seq"),
            F.col("o_orderkey").alias("pk"),
            F.col("o_orderstatus").alias("status"),
            price_col.alias("price"),
        )

    price = F.col("o_totalprice")

    def dec_bump(factor: str):
        # exact-decimal price bump -> identical doubles in both engines
        return (
            F.round(
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit(factor).cast("decimal(3,1)"),
                2,
            ).cast("double")
        )

    changelog = (
        chg("MODIFY", 1, mod10.isin(0, 1), dec_bump("1.1"))
        .unionByName(chg("MODIFY", 2, mod10 == 0, dec_bump("1.2")))
        .unionByName(chg("REMOVE", 1, mod10 == 2, price))
        .unionByName(chg("INSERT", 1, mod10.isin(8, 9), price))
    )
    return base, changelog


@query(
    "b05_cdc_upsert_merge",
    oracle=_MERGE_CTE
    + """
    SELECT pk, status, price FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.pk = b.pk)
    UNION ALL
    SELECT pk, status, price FROM latest WHERE op <> 'REMOVE'
    """,
)
def b05_cdc_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5+B6+B7: full CDC merge — keyed upsert, last-writer-wins
    in-batch dedup, and delete propagation in one pass, via the
    engine's real merge (table/merge.py)."""
    base, changelog = _merge_frames(spark, sf_dir)
    return merge_changes(base, changelog, keys=["pk"], order_cols=["seq"])


@query(
    "b06_inbatch_dedup",
    oracle=_MERGE_CTE + "SELECT op, seq, pk, status, price FROM latest",
)
def b06_inbatch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 isolated: latest change per key within one batch."""
    from dynamodb_zero_etl_s3tables_spark.table.merge import latest_per_key

    _, changelog = _merge_frames(spark, sf_dir)
    return latest_per_key(changelog, keys=["pk"], order_cols=["seq"]).select(
        "op", "seq", "pk", "status", "price"
    )


@query(
    "b07_delete_propagation",
    oracle=_MERGE_CTE
    + """
    SELECT pk, status, price FROM base b
    WHERE NOT EXISTS (
      SELECT 1 FROM latest l WHERE l.pk = b.pk AND l.op = 'REMOVE'
    )
    """,
)
def b07_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 isolated: REMOVE keys anti-joined out of the base table."""
    from dynamodb_zero_etl_s3tables_spark.table.merge import latest_per_key

    base, changelog = _merge_frames(spark, sf_dir)
    removes = (
        latest_per_key(changelog, keys=["pk"], order_cols=["seq"])
        .filter(F.col("op") == "REMOVE")
        .select("pk")
    )
    return base.join(removes, "pk", "left_anti")


@query(
    "b01_bootstrap_snapshot",
    oracle="""
    SELECT o_orderkey AS pk, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders
    """,
)
def b01_bootstrap_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: bootstrap full-snapshot load — the engine's analog of the
    PITR export scan (reference ts:131-144); key column surfaced
    first, as the keyed-table contract requires."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("pk"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
    )


@query(
    "b01b_pitr_export_bootstrap",
    oracle="""
    SELECT 'ORDER#' || o_orderkey AS pk,
           CAST(o_custkey AS BIGINT) AS custkey,
           o_orderstatus AS status,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
           CAST(o_orderdate AS VARCHAR) AS orderdate,
           o_totalprice >= 100000 AS flag,
           array_to_string(list_sort(list_distinct([o_orderpriority, o_orderstatus])), '|')
             AS prio_set,
           CAST(NULL AS VARCHAR) AS missing
    FROM orders
    """,
)
def b01b_pitr_export_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1, end to end on the REAL export layout: encode orders into a
    PITR-shaped directory (``AWSDynamoDB/<id>/data/*.json.gz`` +
    manifest-summary/manifest-files — the artifact the reference's
    ExportTableToPointInTime grant, ts:135, produces), then
    ``ManagedTable.bootstrap_export`` runs the manifest-driven scan,
    the B3 attribute-value decode, the count-integrity check, and one
    snapshot commit. The oracle recomputes the decode from orders, so
    any drift anywhere in encode -> shard -> manifest -> scan ->
    decode -> commit -> read hash-mismatches."""
    import hashlib
    import shutil
    from pathlib import Path

    from dynamodb_zero_etl_s3tables_spark.sources.pitr_export import (
        av_bool,
        av_n,
        av_null,
        av_s,
        av_ss,
        items_to_wire,
        write_export_fixture,
    )
    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.manifest import ManagedTable

    scratch = scratch_dir(sf_dir, "pitr_export")
    if scratch.exists():
        shutil.rmtree(scratch)  # idempotent builder (A10)
    export_root = scratch / "export"
    warehouse = scratch / "warehouse"

    o = load(spark, sf_dir, "orders")
    wire = o.select(
        items_to_wire(
            {
                "pk": av_s(F.concat(F.lit("ORDER#"), F.col("o_orderkey"))),
                "custkey": av_n(F.col("o_custkey")),
                "status": av_s(F.col("o_orderstatus")),
                "totalprice": av_n(F.col("o_totalprice").cast("decimal(12,2)")),
                "orderdate": av_s(F.col("o_orderdate")),
                "flag": av_bool(F.col("o_totalprice") >= 100000),
                "prio_set": av_ss(
                    F.array_sort(
                        F.array(F.col("o_orderpriority"), F.col("o_orderstatus"))
                    )
                ),
                "missing": av_null(),
            }
        )
    )
    write_export_fixture(wire, str(export_root), export_id="01700000000000-fixture")

    t = ManagedTable(
        spark,
        str(warehouse),
        TableSpec(namespace="ingest", name="orders_pitr", key_columns=("pk",)),
    )
    t.bootstrap_export(
        str(export_root),
        fields={
            "pk": "string",
            "custkey": "number",
            "status": "string",
            "totalprice": "number",
            "orderdate": "string",
            "flag": "boolean",
            "prio_set": "string_set",
            "missing": "string",
        },
    )
    return t.read().select(
        "pk",
        F.col("custkey").cast("bigint").alias("custkey"),
        "status",
        F.col("totalprice").cast("double").alias("totalprice"),
        F.col("orderdate").alias("orderdate"),  # ISO string both sides
        "flag",
        F.array_join("prio_set", "|").alias("prio_set"),
        "missing",
    )


@query(
    "b01c_ion_export_bootstrap",
    oracle="""
    SELECT 'ORDER#' || o_orderkey AS pk,
           CAST(o_custkey AS BIGINT) AS custkey,
           o_orderstatus AS status,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
           CAST(o_orderdate AS VARCHAR) AS orderdate,
           o_totalprice >= 100000 AS flag,
           array_to_string(list_sort(list_distinct([o_orderpriority, o_orderstatus])), '|')
             AS prio_set,
           CAST(NULL AS VARCHAR) AS missing
    FROM orders
    """,
)
def b01c_ion_export_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1, the OTHER export wire form (VERDICT r6 #2):
    ``ExportTableToPointInTime`` emits DYNAMODB_JSON *or* ION
    (reference src/dynamodb-zero-etl-s3tables.ts:135); this query
    runs b01b's exact journey with the fixture written as newline-
    delimited text-Ion (``$ion_1_0 {Item:{...}}`` with the published
    type mapping — decimals for N, blobs for B, ``$dynamodb_SS``
    annotations for sets). The reader detects ``outputFormat: ION``
    in manifest-summary.json, converts each line to the item-map JSON
    with the dependency-free Ion parser (Arrow-batched pandas UDF,
    ``functions/ion.py``), and feeds the SAME B3 codec — so this
    oracle is b01b's oracle verbatim: identical rows through a
    different wire format, and a hash match proves the Ion parse is
    lossless.

    Scale: the Ion->JSON conversion is the only Python in the path
    (one string pass per line, partition-parallel); manifest-driven
    scan, decode, and commit are b01b's JVM plans unchanged."""
    import shutil

    from dynamodb_zero_etl_s3tables_spark.functions.ion import (
        item_json_to_ion_udf,
    )
    from dynamodb_zero_etl_s3tables_spark.sources.pitr_export import (
        av_bool,
        av_n,
        av_null,
        av_s,
        av_ss,
        items_to_wire,
        write_export_fixture,
    )
    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.manifest import ManagedTable

    scratch = scratch_dir(sf_dir, "ion_export")
    if scratch.exists():
        shutil.rmtree(scratch)  # idempotent builder (A10)
    export_root = scratch / "export"
    warehouse = scratch / "warehouse"

    o = load(spark, sf_dir, "orders")
    wire = o.select(
        items_to_wire(
            {
                "pk": av_s(F.concat(F.lit("ORDER#"), F.col("o_orderkey"))),
                "custkey": av_n(F.col("o_custkey")),
                "status": av_s(F.col("o_orderstatus")),
                "totalprice": av_n(F.col("o_totalprice").cast("decimal(12,2)")),
                "orderdate": av_s(F.col("o_orderdate")),
                "flag": av_bool(F.col("o_totalprice") >= 100000),
                "prio_set": av_ss(
                    F.array_sort(
                        F.array(F.col("o_orderpriority"), F.col("o_orderstatus"))
                    )
                ),
                "missing": av_null(),
            }
        ).alias("json_line")
    )
    ion_lines = wire.select(item_json_to_ion_udf()(F.col("json_line")))
    write_export_fixture(
        ion_lines,
        str(export_root),
        export_id="01700000000001-ion-fixture",
        output_format="ION",
    )

    t = ManagedTable(
        spark,
        str(warehouse),
        TableSpec(namespace="ingest", name="orders_ion", key_columns=("pk",)),
    )
    t.bootstrap_export(
        str(export_root),
        fields={
            "pk": "string",
            "custkey": "number",
            "status": "string",
            "totalprice": "number",
            "orderdate": "string",
            "flag": "boolean",
            "prio_set": "string_set",
            "missing": "string",
        },
    )
    return t.read().select(
        "pk",
        F.col("custkey").cast("bigint").alias("custkey"),
        "status",
        F.col("totalprice").cast("double").alias("totalprice"),
        F.col("orderdate").alias("orderdate"),
        "flag",
        F.array_join("prio_set", "|").alias("prio_set"),
        "missing",
    )


@query(
    "d90b_merge_evolving",
    oracle="""
    WITH t0 AS (
      SELECT o_orderkey AS pk, o_orderstatus AS status,
             o_totalprice AS price, CAST(o_custkey AS INTEGER) AS custkey
      FROM orders
    ),
    src AS (
      SELECT o_orderkey AS pk,
             o_custkey + 3000000000 AS custkey,
             CAST((o_orderkey % 100) AS DOUBLE) * 0.25 AS discount
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000 AS pk,
             o_custkey + 3000000000 AS custkey,
             CAST(((o_orderkey + 100000000) % 100) AS DOUBLE) * 0.25 AS discount
      FROM orders WHERE o_orderkey % 10 = 3
    ),
    kept AS (
      SELECT t.pk,
             CASE WHEN s.pk IS NOT NULL THEN 'U' ELSE t.status END AS status,
             t.price,
             CAST(CASE WHEN s.pk IS NOT NULL THEN s.custkey
                       ELSE t.custkey END AS BIGINT) AS custkey,
             CASE WHEN s.pk IS NOT NULL THEN s.discount
                  ELSE NULL END AS discount
      FROM t0 t LEFT JOIN src s ON t.pk = s.pk
    ),
    ins AS (
      SELECT s.pk, 'N' AS status, 0.0 AS price,
             CAST(s.custkey AS BIGINT) AS custkey, s.discount
      FROM src s LEFT JOIN t0 t ON s.pk = t.pk WHERE t.pk IS NULL
    )
    SELECT pk, status, CAST(price AS DOUBLE) AS price, custkey,
           CAST(discount AS DOUBLE) AS discount
    FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
    """,
)
def d90b_merge_evolving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D90 x B4 (VERDICT r6 #7): MERGE INTO with Delta-style
    AUTOMATIC SCHEMA EVOLUTION (``mergeSchema``) on a managed table —
    the source carries a column the target lacks (``discount``,
    added: NULL on untouched rows) and a WIDER type for an existing
    one (``custkey`` int -> bigint, the Iceberg promotion), and ONE
    merge commit both applies the clauses and evolves the manifest
    schema through the shared B4 gate (h21 proved this on the
    streaming path; this is the batch verb). Non-promotable changes
    refuse with SchemaEvolutionError — pinned by
    ``test_merge_properties.py``. The oracle replays the widened
    merge in ANSI SQL, so the hash checks evolution semantics, not
    just the join.

    Scale: identical plan to d90 — one equi-shuffle join + an
    insert anti-join; the widening is a projection folded into the
    same pass, and carried partitions are untouched metadata."""
    import shutil

    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.manifest import ManagedTable

    scratch = scratch_dir(sf_dir, "merge_evolving")
    if scratch.exists():
        shutil.rmtree(scratch)  # idempotent builder (A10)

    o = load(spark, sf_dir, "orders")
    t0 = o.select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.col("o_custkey").cast("int").alias("custkey"),
    )
    t = ManagedTable(
        spark,
        str(scratch / "warehouse"),
        TableSpec(namespace="analytics", name="orders_evolving",
                  key_columns=("pk",)),
    )
    t.bootstrap(t0)

    ten = F.col("o_orderkey") % 10
    src = (
        o.filter(ten == 0).select(
            F.col("o_orderkey").alias("pk"),
            (F.col("o_custkey") + 3000000000).alias("custkey"),
            ((F.col("o_orderkey") % 100).cast("double") * 0.25).alias("discount"),
        )
        .unionAll(
            o.filter(ten == 3).select(
                (F.col("o_orderkey") + 100000000).alias("pk"),
                (F.col("o_custkey") + 3000000000).alias("custkey"),
                (((F.col("o_orderkey") + 100000000) % 100).cast("double")
                 * 0.25).alias("discount"),
            )
        )
    )
    t.merge_into(
        src,
        matched=[
            (
                "update",
                None,
                {
                    "status": F.lit("U"),
                    "custkey": F.col("s.custkey"),
                    "discount": F.col("s.discount"),
                },
            ),
        ],
        insert_values={
            "pk": F.col("pk"),
            "status": F.lit("N"),
            "price": F.lit(0.0),
            "custkey": F.col("custkey"),
            "discount": F.col("discount"),
        },
        merge_schema=True,
    )
    return t.read().select(
        "pk", "status",
        F.col("price").cast("double").alias("price"),
        F.col("custkey").cast("bigint").alias("custkey"),
        F.col("discount").cast("double").alias("discount"),
    )


@query(
    "d90_merge_into",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS k,
             CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS new_price
      FROM orders WHERE o_orderkey % 10 IN (0, 1, 2)
      UNION ALL
      SELECT o_orderkey + 100000000 AS k,
             CAST(o_orderkey % 1000 AS DOUBLE) + 0.5 AS new_price
      FROM orders WHERE o_orderkey % 10 = 3
    ),
    m AS (
      SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice, s.k, s.new_price
      FROM orders t LEFT JOIN src s ON t.o_orderkey = s.k
    ),
    kept AS (
      SELECT o_orderkey,
             CASE WHEN k IS NOT NULL AND o_orderstatus = 'O'
                  THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN k IS NOT NULL AND o_orderstatus = 'O'
                  THEN new_price ELSE o_totalprice END AS o_totalprice
      FROM m
      WHERE NOT (k IS NOT NULL AND o_orderstatus = 'F')
    ),
    ins AS (
      SELECT s.k AS o_orderkey, 'N' AS o_orderstatus, s.new_price AS o_totalprice
      FROM src s LEFT JOIN orders t ON s.k = t.o_orderkey
      WHERE t.o_orderkey IS NULL
    )
    SELECT * FROM kept UNION ALL SELECT * FROM ins
    """,
)
def d90_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-surface: multi-action conditional MERGE INTO — the
    Delta/Iceberg SQL verb (WHEN MATCHED AND cond THEN UPDATE /
    WHEN MATCHED AND cond THEN DELETE / WHEN NOT MATCHED THEN
    INSERT) run through the engine's generic ``table.merge.merge_into``
    against a deterministic source batch: matched open orders get a
    10% reprice and status 'U', matched finished orders are deleted,
    source keys beyond the table insert as status 'N'; matched rows
    winning no clause (status 'P') carry through untouched. The
    oracle restates the clause semantics as LEFT JOIN + CASE +
    anti-join, so the hash checks clause ORDERING and the
    first-match-wins rule, not just the join.

    Scale: one equi-shuffle join resolves every matched clause
    (conditions are row-local projections — no per-clause table
    passes); the insert branch is a source-sized anti-join. Same
    cost shape as the b05 CDC merge."""
    from dynamodb_zero_etl_s3tables_spark.table.merge import merge_into

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    ten = F.col("o_orderkey") % 10
    reprice = (
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit(1.1).cast("decimal(2,1)"),
            2,
        )
        .cast("double")
    )
    src = (
        o.filter(ten.isin(0, 1, 2))
        .select(F.col("o_orderkey").alias("k"), reprice.alias("new_price"))
        .unionAll(
            o.filter(ten == 3).select(
                (F.col("o_orderkey") + 100000000).alias("k"),
                ((F.col("o_orderkey") % 1000).cast("double") + 0.5).alias(
                    "new_price"
                ),
            )
        )
    )
    return merge_into(
        o,
        src,
        on=[("o_orderkey", "k")],
        matched=[
            (
                "update",
                F.col("t.o_orderstatus") == "O",
                {
                    "o_orderstatus": F.lit("U"),
                    "o_totalprice": F.col("s.new_price"),
                },
            ),
            ("delete", F.col("t.o_orderstatus") == "F", None),
        ],
        insert_values={
            "o_orderkey": F.col("k"),
            "o_orderstatus": F.lit("N"),
            "o_totalprice": F.col("new_price"),
        },
    )


@query(
    "d90c_sql_merge_schema_evolution",
    oracle="""
    WITH t0 AS (
      SELECT o_orderkey AS pk, o_orderstatus AS status,
             o_totalprice AS price
      FROM orders
    ),
    src AS (
      SELECT o_orderkey AS pk,
             CAST((o_orderkey % 100) AS DOUBLE) * 0.25 AS discount
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000 AS pk,
             CAST(((o_orderkey + 100000000) % 100) AS DOUBLE) * 0.25
      FROM orders WHERE o_orderkey % 10 = 3
    ),
    kept AS (
      SELECT t.pk,
             CASE WHEN s.pk IS NOT NULL THEN 'U' ELSE t.status END AS status,
             t.price,
             CASE WHEN s.pk IS NOT NULL THEN s.discount
                  ELSE NULL END AS discount
      FROM t0 t LEFT JOIN src s ON t.pk = s.pk
    ),
    ins AS (
      SELECT s.pk, CAST(NULL AS VARCHAR) AS status,
             CAST(NULL AS DOUBLE) AS price, s.discount
      FROM src s LEFT JOIN t0 t ON s.pk = t.pk WHERE t.pk IS NULL
    )
    SELECT pk, status, CAST(price AS DOUBLE) AS price,
           CAST(discount AS DOUBLE) AS discount
    FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
    """,
)
def d90c_sql_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d90b's SQL door (r10, VERDICT r9 #4): ``MERGE WITH SCHEMA
    EVOLUTION INTO`` — Delta's opt-in syntax — routed through
    ``ZeroEtlEngine.sql``. The source carries a column the target
    lacks (``discount``); the evolving statement's UPDATE SET assigns
    it on matched rows and ``INSERT *`` lands it on new keys, with the
    column added through the same additive-union gate the programmatic
    d90b path uses (NULL on untouched rows) — the reference pipeline's
    auto-evolving target (glue:UpdateTable,
    src/dynamodb-zero-etl-s3tables.ts:110-117) behind an explicit SQL
    opt-in. The journey also pins the inconsistent-door fix the r9
    verdict named: the SAME statement WITHOUT the clause still refuses
    loudly. The oracle replays the evolving merge in ANSI SQL.

    Scale: string routing is driver-side; the executed plan is
    d90b's — one equi-shuffle join + insert anti-join, the evolution
    a folded projection."""
    from dynamodb_zero_etl_s3tables_spark.engine import ZeroEtlEngine
    from dynamodb_zero_etl_s3tables_spark.operators.sources_sinks import _scratch
    from dynamodb_zero_etl_s3tables_spark.spec import SourceSpec, TableSpec

    wh = _scratch(sf_dir, "warehouse_d90c", wipe=True)
    eng = ZeroEtlEngine(
        spark,
        wh,
        SourceSpec(table_name="orders-ddb", key_columns=("pk",)),
        TableSpec(namespace="analytics", name="orders_sqlevo",
                  key_columns=("pk",)),
    )
    o = load(spark, sf_dir, "orders")
    eng.bootstrap(
        o.select(
            F.col("o_orderkey").alias("pk"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        )
    )
    ten = F.col("o_orderkey") % 10
    src = (
        o.filter(ten == 0).select(
            F.col("o_orderkey").alias("pk"),
            ((F.col("o_orderkey") % 100).cast("double") * 0.25).alias(
                "discount"
            ),
        )
        .unionAll(
            o.filter(ten == 3).select(
                (F.col("o_orderkey") + 100000000).alias("pk"),
                (((F.col("o_orderkey") + 100000000) % 100).cast("double")
                 * 0.25).alias("discount"),
            )
        )
    )
    src.createOrReplaceTempView("src_d90c")
    stmt_tail = (
        "INTO analytics.orders_sqlevo t USING src_d90c s ON t.pk = s.pk "
        "WHEN MATCHED THEN UPDATE SET status = 'U', discount = s.discount "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    # without the clause the strict door refuses (r9's fix kept intact)
    try:
        eng.sql("MERGE " + stmt_tail)
        raise AssertionError("non-evolving MERGE must refuse the new column")
    except ValueError:
        pass
    eng.sql("MERGE WITH SCHEMA EVOLUTION " + stmt_tail)
    return eng.read().select(
        "pk", "status",
        F.col("price").cast("double").alias("price"),
        F.col("discount").cast("double").alias("discount"),
    )
