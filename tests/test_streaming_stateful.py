"""applyInPandasWithState test (custom stateful operator): draining a
file backlog through the running-total operator equals a batch
groupBy over the same files, and state carries across microbatches."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_zero_etl_s3tables_spark.streaming.stateful import (
    RUNNING_TOTAL_SCHEMA,
    running_extremes,
    running_totals,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BATCH1 = [
    {"user_id": 1, "event_id": 1, "value": 10.0},
    {"user_id": 1, "event_id": 2, "value": 5.0},
    {"user_id": 2, "event_id": 3, "value": 7.0},
]
BATCH2 = [
    {"user_id": 1, "event_id": 4, "value": 1.0},
    {"user_id": 3, "event_id": 5, "value": 2.0},
]


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_running_totals_state_across_batches(spark, tmp_path):
    src = tmp_path / "events_in"
    _write(src / "b1.json", BATCH1)

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    updates: dict[int, tuple] = {}

    def capture(batch_df, batch_id):
        for row in batch_df.collect():
            updates[row["user_id"]] = (row["n_events"], row["total_value"])

    def drain():
        q = (
            running_totals(stream)
            .writeStream.foreachBatch(capture)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert updates[1] == (2, 15.0)
    assert updates[2] == (1, 7.0)

    # second file arrives: state must carry over, not reset
    _write(src / "b2.json", BATCH2)
    drain()
    assert updates[1] == (3, 16.0)  # 2 prior events + 1 new
    assert updates[2] == (1, 7.0)  # untouched this batch
    assert updates[3] == (1, 2.0)

    # batch-twin law: final totals == plain groupBy over all files
    batch = (
        spark.read.schema(EVENT_SCHEMA)
        .json(str(src))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
    )
    expected = {r["user_id"]: (r["n"], r["t"]) for r in batch.collect()}
    assert updates == expected


def test_output_schema_matches_contract():
    assert [f.name for f in RUNNING_TOTAL_SCHEMA.fields] == [
        "user_id",
        "n_events",
        "total_value",
    ]


def test_transform_with_state_extremes_across_batches(spark, tmp_path):
    """Spark-4 StatefulProcessor twin of the running-totals law:
    state carries across microbatches and the drained result equals a
    batch groupBy count/max over the same files.

    transformWithStateInPandas talks to the state store over a
    protobuf channel, so it needs google.protobuf at runtime. This
    test never skips: where the dependency is absent (this container
    — installs are unavailable, the documented impossibility), the
    wrapper must refuse with an actionable error that names both the
    missing package and the dependency-free twin; where it is
    present, the full cross-batch state law runs."""
    from dynamodb_zero_etl_s3tables_spark.streaming.stateful import has_protobuf

    if not has_protobuf():
        df = spark.readStream.schema(EVENT_SCHEMA).json(str(tmp_path))
        with pytest.raises(ImportError, match="protobuf.*running_totals"):
            running_extremes(df)
        return
    src = tmp_path / "events_tws"
    _write(src / "b1.json", BATCH1)

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    updates: dict[int, tuple] = {}

    def capture(batch_df, batch_id):
        for row in batch_df.collect():
            updates[row["user_id"]] = (row["n_events"], row["max_value"])

    def drain():
        q = (
            running_extremes(stream)
            .writeStream.foreachBatch(capture)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert updates[1] == (2, 10.0)
    assert updates[2] == (1, 7.0)

    _write(src / "b2.json", BATCH2)
    drain()
    assert updates[1] == (3, 10.0)  # state carried: max unchanged
    assert updates[3] == (1, 2.0)

    batch = (
        spark.read.schema(EVENT_SCHEMA)
        .json(str(src))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("value").alias("m"))
    )
    expected = {r["user_id"]: (r["n"], r["m"]) for r in batch.collect()}
    assert updates == expected
