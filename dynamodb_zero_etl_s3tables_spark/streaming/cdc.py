"""Streaming CDC ingestion (SURVEY.md §2 B2, H1, H7, H8).

The reference's integration continuously replicates DynamoDB changes
into the Iceberg table ("data flows automatically ... Zero-ETL",
reference README.md:12,93; integration resource ts:211-215). Here the
change feed is a file-based Structured Streaming source of change
records ``(op, ts, seq, keys..., image...)``; each microbatch merges
into the ManagedTable via foreachBatch — the stateful upsert sink.

``trigger(availableNow=True)`` drains the backlog then stops, which
is both the testable form and the batch-parity guarantee: a stream
drain must equal one big batch merge of the same files (H7's oracle
law, checked in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from dynamodb_zero_etl_s3tables_spark.table.manifest import ManagedTable

#: change-log columns the merge protocol itself requires
CHANGELOG_EXTRA_FIELDS = [
    T.StructField("op", T.StringType(), False),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("seq", T.LongType(), True),
]


def changelog_schema(image_schema: T.StructType) -> T.StructType:
    """Schema of a change record: op/ts/seq + the row image columns."""
    return T.StructType(CHANGELOG_EXTRA_FIELDS + list(image_schema.fields))


def read_changelog_stream(
    spark: SparkSession,
    directory: str,
    schema: T.StructType,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """H1: file-based streaming source over a change-log directory
    (the driver/test feeds files into it)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(directory)


def apply_changes_stream(
    table: ManagedTable,
    changes: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
    strategy: str = "copy-on-write",
    auto_compact: bool = False,
    max_delta_layers: int = 5,
) -> StreamingQuery:
    """H7+H8: stateful upsert sink — every microbatch runs the B5-B7
    merge transaction against the manifest table. Exactly-once comes
    from the checkpoint (source offsets) + idempotent merge (A10):
    replaying a batch after failure converges to the same state.

    ``strategy="merge-on-read"`` makes each microbatch an O(batch)
    delta commit instead of a table rewrite — the right default for
    high-cadence streams on large tables; ``auto_compact=True`` folds
    the accumulated layers whenever the chain passes
    ``max_delta_layers`` (metadata-only check per batch, B11). Note:
    replaying a MoR microbatch after a checkpoint-gap failure stacks a
    duplicate layer; the layered LWW semantics still converge to the
    same state, preserving A10."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not table.exists():
            # B8: create-on-first-write with an empty base of the image schema
            image_cols = [
                f for f in batch_df.schema.fields if f.name not in ("op", "seq")
            ]
            empty = table.spark.createDataFrame([], T.StructType(image_cols))
            table.bootstrap(empty)
        table.apply_changes(batch_df, strategy=strategy)
        if auto_compact:
            table.maybe_compact(max_delta_layers=max_delta_layers)

    writer = (
        changes.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# -- streaming schema evolution (B4 x H7, VERDICT r5 #5) ---------------------

def read_raw_changelog_stream(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Schema-evolving H1 source: read the change-log NDJSON as raw
    TEXT lines, deferring ALL schema decisions to per-microbatch
    inference in :func:`apply_changes_stream_evolving`. A fixed-schema
    ``read_changelog_stream`` silently drops attributes that first
    appear mid-stream (the file source binds its column set at
    ``start()``); the raw form is what lets one continuously-running
    query pick up new attributes — the ``glue:UpdateTable`` additive
    contract of the reference integration (reference
    src/dynamodb-zero-etl-s3tables.ts:110-117) without a restart."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(directory)


def _infer_batch(batch_df: DataFrame, target: ManagedTable) -> DataFrame:
    """Type one microbatch of raw NDJSON lines: merge the batch's
    observed shape JVM-side (``parse_json`` into VariantType, then the
    ``schema_of_variant_agg`` aggregate — Spark 4's native
    schema-union, one bounded driver scalar per batch), expand with
    ``from_json``, then normalize:

    * columns the target already has cast to the TARGET type (epoch
      longs -> timestamp ts, int -> long, ...), so a batch can never
      silently fork an existing column's type;
    * protocol columns (op/ts/seq) cast per CHANGELOG_EXTRA_FIELDS;
    * NEW columns keep their inferred type, with JSON decimals
      surfaced as DOUBLE (variant infers exact DECIMAL(p,s) per
      batch, which would ratchet precision batch-to-batch; DOUBLE is
      the stable wire-number type, matching B3's N-decode).
    """
    from pyspark.sql import functions as F

    ddl = (
        batch_df.select(
            F.schema_of_variant_agg(F.parse_json(F.col("value"))).alias("s")
        )
        .first()
        .s
    )
    typed = (
        batch_df.select(F.from_json("value", ddl.replace("OBJECT<", "STRUCT<")).alias("r"))
        .select("r.*")
    )
    target_types = {}
    if target.exists():
        target_types = {f.name: f.dataType for f in target.read().schema.fields}
    for f in CHANGELOG_EXTRA_FIELDS:
        target_types.setdefault(f.name, f.dataType)
    cols = []
    for f in typed.schema.fields:
        if f.name in target_types:
            cols.append(F.col(f.name).cast(target_types[f.name]).alias(f.name))
        elif isinstance(f.dataType, T.DecimalType):
            cols.append(F.col(f.name).cast("double").alias(f.name))
        else:
            cols.append(F.col(f.name))
    return typed.select(cols)


def apply_changes_stream_evolving(
    table: ManagedTable,
    raw_lines: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
    strategy: str = "copy-on-write",
) -> StreamingQuery:
    """H7 sink with mid-stream ADDITIVE SCHEMA EVOLUTION: each
    microbatch is typed by its own inferred (batch-merged) schema and
    merged via ``apply_changes``, whose B4 ``_evolve_schema`` widening
    appends never-seen columns to the target — so an attribute that
    first appears in batch N lands as a new table column during the
    SAME query run, no restart, exactly the reference's
    ``glue:UpdateTable`` additive promise. Earlier rows read NULL for
    the new column (additive evolution); existing columns are pinned
    to the target's types, so evolution is append-only, never a type
    fork. Batch parity: a drain equals one big batch merge of the
    union schema (pytest law, test_streaming.py).

    Scale: inference is one JVM aggregate over the batch (no Python
    row work, no second file read), and the merge cost is unchanged —
    the evolving path costs one ``schema_of_variant_agg`` scalar over
    what ``apply_changes_stream`` already does."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        typed = _infer_batch(batch_df, table)
        if not table.exists():
            image_cols = [
                f for f in typed.schema.fields if f.name not in ("op", "seq")
            ]
            empty = table.spark.createDataFrame([], T.StructType(image_cols))
            table.bootstrap(empty)
        table.apply_changes(typed, strategy=strategy)

    writer = (
        raw_lines.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
