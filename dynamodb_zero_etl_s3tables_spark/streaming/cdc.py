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
