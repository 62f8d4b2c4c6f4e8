"""Streaming CDC + window tests (SURVEY.md §2 H1-H8): every streaming
path must equal its batch twin on the same data."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_zero_etl_s3tables_spark.sources.testdata import load
from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.streaming.cdc import (
    apply_changes_stream,
    changelog_schema,
    read_changelog_stream,
)
from dynamodb_zero_etl_s3tables_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)
from dynamodb_zero_etl_s3tables_spark.table.manifest import ManagedTable
from dynamodb_zero_etl_s3tables_spark.table.merge import merge_changes

SF_DIR = "/root/testdata/sf0.001"

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("pk", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("price", T.DoubleType()),
    ]
)

SPEC = TableSpec(
    namespace="ns", name="stream_items", key_columns=("pk",), order_columns=("seq",)
)


def _write_batch(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


BATCH1 = [
    {"op": "INSERT", "ts": "2024-01-01T00:00:00", "seq": i, "pk": i,
     "status": "new", "price": float(i)}
    for i in range(1, 6)
]
BATCH2 = [
    {"op": "MODIFY", "ts": "2024-01-02T00:00:00", "seq": 10, "pk": 1,
     "status": "upd", "price": 11.0},
    {"op": "MODIFY", "ts": "2024-01-02T00:00:00", "seq": 11, "pk": 1,
     "status": "upd2", "price": 12.0},
    {"op": "REMOVE", "ts": "2024-01-02T00:00:00", "seq": 10, "pk": 2,
     "status": None, "price": None},
    {"op": "INSERT", "ts": "2024-01-02T00:00:00", "seq": 10, "pk": 7,
     "status": "late", "price": 70.0},
]


def test_stream_merge_equals_batch_merge(spark, warehouse, tmp_path):
    """H1+H7+H8: drain a 2-file changelog dir with availableNow ->
    final table state == one batch merge over the concatenated log."""
    log_dir = tmp_path / "changelog"
    _write_batch(log_dir / "b1.json", BATCH1)
    _write_batch(log_dir / "b2.json", BATCH2)

    table = ManagedTable(spark, warehouse, SPEC)
    stream = read_changelog_stream(
        spark, str(log_dir), changelog_schema(IMAGE_SCHEMA), max_files_per_trigger=1
    )
    q = apply_changes_stream(table, stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {r.pk: (r.status, r.price) for r in table.read().collect()}

    # batch twin: merge the whole log into an empty base in one go
    full_log = spark.read.schema(changelog_schema(IMAGE_SCHEMA)).json(str(log_dir))
    empty = spark.createDataFrame([], IMAGE_SCHEMA)
    expected_df = merge_changes(empty, full_log, keys=["pk"], order_cols=["ts", "seq"])
    expected = {r.pk: (r.status, r.price) for r in expected_df.collect()}

    assert got == expected
    assert got[1] == ("upd2", 12.0)  # in-batch LWW
    assert 2 not in got              # delete propagated
    assert got[7] == ("late", 70.0)  # second-file insert


def test_stream_restart_is_idempotent(spark, warehouse, tmp_path):
    """H8 checkpoint + A10 idempotent merge: re-starting the drained
    stream adds nothing; feeding a new file picks up from offsets."""
    log_dir = tmp_path / "changelog"
    _write_batch(log_dir / "b1.json", BATCH1)
    table = ManagedTable(spark, warehouse, SPEC)
    schema = changelog_schema(IMAGE_SCHEMA)
    ckpt = str(tmp_path / "ckpt")

    q = apply_changes_stream(table, read_changelog_stream(spark, str(log_dir), schema), ckpt)
    q.awaitTermination(120)
    v1 = table.version

    # restart with no new data: no new commits
    q = apply_changes_stream(table, read_changelog_stream(spark, str(log_dir), schema), ckpt)
    q.awaitTermination(120)
    assert table.version == v1

    # new file arrives: exactly the delta applies
    _write_batch(log_dir / "b2.json", BATCH2)
    q = apply_changes_stream(table, read_changelog_stream(spark, str(log_dir), schema), ckpt)
    q.awaitTermination(120)
    got = {r.pk for r in table.read().collect()}
    assert got == {1, 3, 4, 5, 7}


def _drain_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return df.sparkSession.table(name)


def test_tumbling_stream_equals_batch(spark, tmp_path):
    """H3: streaming tumbling agg over the events table (replayed as
    a file stream) == the same builder applied in batch."""
    events = load(spark, SF_DIR, "events").select("event_id", "ts", "user_id", "value")
    stream_src = tmp_path / "events_stream"
    events.write.parquet(str(stream_src))

    stream = spark.readStream.schema(events.schema).parquet(str(stream_src))
    aggs = [F.count("*").alias("n"), F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("v")]
    got = _drain_to_memory(
        tumbling_agg(stream, "ts", "1 day", ["user_id"], aggs, watermark="1 hour"),
        "tumb",
    ).collect()
    expected = tumbling_agg(events, "ts", "1 day", ["user_id"], aggs).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_session_stream_equals_batch(spark, tmp_path):
    """H5: streaming session_window == batch session_window on the
    same data (and the gap-islands twin is checked by the oracle)."""
    events = load(spark, SF_DIR, "events").select("event_id", "ts", "user_id", "value")
    stream_src = tmp_path / "events_stream"
    events.write.parquet(str(stream_src))
    stream = spark.readStream.schema(events.schema).parquet(str(stream_src))
    aggs = [F.count("*").alias("n")]
    got = _drain_to_memory(
        session_agg(stream, "ts", "30 minutes", ["user_id"], aggs, watermark="1 hour"),
        "sess",
    ).collect()
    expected = session_agg(events, "ts", "30 minutes", ["user_id"], aggs).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_stream_dedup(spark, tmp_path):
    """H6: streaming dropDuplicates keeps one row per key."""
    events = load(spark, SF_DIR, "events").select("event_id", "ts", "user_id", "event_type")
    stream_src = tmp_path / "events_stream"
    events.write.parquet(str(stream_src))
    stream = spark.readStream.schema(events.schema).parquet(str(stream_src))
    deduped = stream_dedup(stream, ["user_id", "event_type"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup")
    n_keys = events.select("user_id", "event_type").distinct().count()
    assert got.count() == n_keys
    assert got.select("user_id", "event_type").distinct().count() == n_keys


def test_stream_mor_equals_cow_stream(spark, warehouse, tmp_path):
    """H7 with merge-on-read microbatches: delta-layer commits through
    the streaming sink converge to the same state as copy-on-write."""
    log_dir = tmp_path / "changelog_mor"
    _write_batch(log_dir / "b1.json", BATCH1)
    _write_batch(log_dir / "b2.json", BATCH2)
    schema = changelog_schema(IMAGE_SCHEMA)

    mor = ManagedTable(
        spark, warehouse,
        TableSpec(namespace="ns", name="stream_mor", key_columns=("pk",),
                  order_columns=("seq",)),
    )
    q = apply_changes_stream(
        mor,
        read_changelog_stream(spark, str(log_dir), schema, max_files_per_trigger=1),
        str(tmp_path / "ckpt_mor"),
        strategy="merge-on-read",
    )
    q.awaitTermination(120)
    # every merge microbatch committed as a delta layer, no rewrite
    ops = [s.operation for s in mor.history()]
    assert ops[0] == "bootstrap" and set(ops[1:]) == {"merge-mor"}

    cow = ManagedTable(spark, warehouse, SPEC)
    q2 = apply_changes_stream(
        cow,
        read_changelog_stream(spark, str(log_dir), schema, max_files_per_trigger=1),
        str(tmp_path / "ckpt_cow"),
    )
    q2.awaitTermination(120)
    assert sorted(map(tuple, mor.read().collect())) == sorted(
        map(tuple, cow.read().collect())
    )


def test_stream_static_join_equals_batch(spark, tmp_path):
    """H: stream-static enrichment — the h09 twin's semantics through
    a real readStream: each microbatch broadcast-joins the static
    nation dimension; the drained result equals the batch join."""
    events = load(spark, SF_DIR, "events").select("event_id", "user_id", "event_type", "value")
    src = tmp_path / "events_src"
    events.write.parquet(str(src))
    nation = load(spark, SF_DIR, "nation")

    def enrich(df):
        return (
            df.withColumn("nk", F.col("user_id") % 25)
            .join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
            .select("event_id", "n_name", "event_type", "value")
        )

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        enrich(stream)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("enriched").collect()))
    want = sorted(map(tuple, enrich(events).collect()))
    assert got == want


def test_stream_mor_auto_compact(spark, warehouse, tmp_path):
    """H7+B11: a MoR stream with auto_compact folds its delta chain
    once it passes the layer threshold; state is unaffected."""
    log_dir = tmp_path / "log_ac"
    for i, rows in enumerate((BATCH1, BATCH2, BATCH1, BATCH2)):
        _write_batch(log_dir / f"b{i}.json", rows)
    t = ManagedTable(
        spark, warehouse,
        TableSpec(namespace="ns", name="ac", key_columns=("pk",), order_columns=("seq",)),
    )
    q = apply_changes_stream(
        t,
        read_changelog_stream(
            spark, str(log_dir), changelog_schema(IMAGE_SCHEMA), max_files_per_trigger=1
        ),
        str(tmp_path / "ckpt_ac"),
        strategy="merge-on-read",
        auto_compact=True,
        max_delta_layers=2,
    )
    q.awaitTermination(120)
    ops = [s.operation for s in t.history()]
    assert "compact" in ops, ops
    # compaction must not change state: equal to a CoW stream of the
    # same log (sequential microbatch semantics on both sides)
    ref = ManagedTable(
        spark, warehouse,
        TableSpec(namespace="ns", name="ac_ref", key_columns=("pk",), order_columns=("seq",)),
    )
    q2 = apply_changes_stream(
        ref,
        read_changelog_stream(
            spark, str(log_dir), changelog_schema(IMAGE_SCHEMA), max_files_per_trigger=1
        ),
        str(tmp_path / "ckpt_ac_ref"),
    )
    q2.awaitTermination(120)
    got = {r.pk: (r.status, r.price) for r in t.read().collect()}
    assert got == {r.pk: (r.status, r.price) for r in ref.read().collect()}


def test_corpus_gate_stream_equals_batch(spark, tmp_path):
    """H10: the corpus-ingest quality gate produces identical admitted
    counts whether documents arrive as a batch table or replayed as a
    file stream (stateless gate + tiny keyed aggregation)."""
    from dynamodb_zero_etl_s3tables_spark.operators.stream_twins import corpus_gate

    docs = load(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    stream_src = tmp_path / "docs_stream"
    docs.write.parquet(str(stream_src))
    stream = spark.readStream.schema(docs.schema).parquet(str(stream_src))
    got = _drain_to_memory(corpus_gate(stream), "gate").collect()
    expected = corpus_gate(docs).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """H11: stream-stream interval join — purchases and clicks each
    arrive as their own file-backed stream; the watermarked interval
    join's drained output equals the batch join on the same data."""
    from dynamodb_zero_etl_s3tables_spark.streaming.joins import (
        purchase_click_attribution,
    )

    e = load(spark, SF_DIR, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    p_src, c_src = tmp_path / "purchases", tmp_path / "clicks"
    purchases.write.parquet(str(p_src))
    clicks.write.parquet(str(c_src))

    p_stream = spark.readStream.schema(purchases.schema).parquet(str(p_src))
    c_stream = spark.readStream.schema(clicks.schema).parquet(str(c_src))
    q = (
        purchase_click_attribution(p_stream, c_stream)
        .writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.table("attributed").collect()))
    want = sorted(
        map(tuple, purchase_click_attribution(purchases, clicks).collect())
    )
    assert got == want and len(got) > 0


def test_stream_stream_left_outer_join_equals_batch(spark, tmp_path):
    """H12: LEFT OUTER stream-stream interval join — null-padded rows
    for unattributed purchases emit only once the joint watermark
    passes the purchase's lookback window, so the drain needs
    watermark-advancing sentinel files after the real data (one file
    per micro-batch via maxFilesPerTrigger); sentinels use user_id=-1
    and are excluded from the comparison."""
    import datetime as dt

    from pyspark.sql import Row

    from dynamodb_zero_etl_s3tables_spark.streaming.joins import (
        purchase_click_attribution,
    )

    e = load(spark, SF_DIR, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    p_src, c_src = str(tmp_path / "p"), str(tmp_path / "c")
    purchases.coalesce(1).write.parquet(p_src)
    clicks.coalesce(1).write.parquet(c_src)
    max_ts = e.agg(F.max("ts")).collect()[0][0]
    # two sentinel waves: wave 1 advances the watermark past every
    # real window end; wave 2 forces the batch in which eviction runs
    for hours in (10, 20):
        flush = max_ts + dt.timedelta(hours=hours)
        spark.createDataFrame(
            [Row(purchase_id=-hours, user_id=-1, p_ts=flush)],
            schema=purchases.schema,
        ).coalesce(1).write.mode("append").parquet(p_src)
        spark.createDataFrame(
            [Row(click_id=-hours, user_id=-1, c_ts=flush)],
            schema=clicks.schema,
        ).coalesce(1).write.mode("append").parquet(c_src)

    p_stream = (
        spark.readStream.schema(purchases.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(p_src)
    )
    c_stream = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(c_src)
    )
    q = (
        purchase_click_attribution(p_stream, c_stream, how="left_outer")
        .writeStream.format("memory")
        .queryName("attributed_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        map(
            tuple,
            spark.table("attributed_outer").filter("user_id >= 0").collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            purchase_click_attribution(
                purchases, clicks, how="left_outer"
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    # the outer rows are the point: some purchases must be unattributed
    assert any(t[1] is None for t in got)


def test_dynamic_gap_session_stream_equals_batch(spark, tmp_path):
    """h15: streaming session_window with a DYNAMIC per-event gap
    (60 min after a purchase, 30 min otherwise) == the batch twin
    (registry h15_session_window_twin) on the same events — the
    session-merge state machinery is shared between modes, so any
    divergence would be a watermark/late-data artifact. The oversized
    watermark delay (fixture discipline, see h13) makes the result
    microbatch-split-invariant."""
    from dynamodb_zero_etl_s3tables_spark.operators.stream_twins import (
        h15_session_window_twin,
    )

    events = (
        load(spark, SF_DIR, "events")
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
            "value",
        )
    )
    stream_src = tmp_path / "events_stream"
    events.write.parquet(str(stream_src))
    stream = spark.readStream.schema(events.schema).parquet(str(stream_src))
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("60 minutes")
    ).otherwise(F.lit("30 minutes"))
    agg = (
        stream.withWatermark("ts", "3650 days")
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
    got = _drain_to_memory(agg, "dynsess").collect()
    expected = h15_session_window_twin(spark, SF_DIR).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_chained_window_stream_equals_batch(spark, tmp_path):
    """h16: streaming chained window aggregation (hourly -> daily via
    window_time) == the batch twin. Chained stateful aggs require
    append mode, and append only emits windows the watermark has
    closed — so the input carries one far-future SENTINEL row to push
    the global watermark past every real window; the sentinel's own
    (never-closed) windows are excluded from the comparison."""
    from dynamodb_zero_etl_s3tables_spark.operators.stream_twins import (
        h16_chained_window_twin,
    )

    events = load(spark, SF_DIR, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(max_ts, "__sentinel__", 0.0)], schema=events.schema
    ).select(
        (F.col("ts") + F.expr("INTERVAL 60 DAYS")).alias("ts"),
        "event_type",
        "value",
    )
    stream_src = tmp_path / "events_stream"
    events.unionAll(sentinel).write.parquet(str(stream_src))

    stream = spark.readStream.schema(events.schema).parquet(str(stream_src))
    hourly = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w1"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("v_dec"),
        )
    )
    daily = (
        hourly.groupBy(
            F.window(F.window_time("w1"), "1 day").alias("w2"), "event_type"
        )
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("v_dec").cast("double").alias("total_value"),
            F.count("*").alias("n_hours"),
        )
        .select(
            F.col("w2.start").alias("day_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_hours",
        )
    )
    q = (
        daily.writeStream.format("memory")
        .queryName("chained_daily")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("chained_daily")
        .filter(F.col("event_type") != "__sentinel__")
        .collect()
    )
    expected = h16_chained_window_twin(spark, SF_DIR).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_stream_wap_per_microbatch(spark, warehouse, tmp_path):
    """Streaming x WAP composition: every microbatch is STAGED,
    audited against an invariant (no negative prices), and only then
    published — the gated-CDC shape a table owner runs when upstream
    batches can carry poison. A batch that fails its audit is aborted
    and the table keeps its pre-batch state; clean batches land
    exactly as a plain streaming merge would."""
    log_dir = tmp_path / "changelog"
    _write_batch(log_dir / "b1.json", BATCH1)
    poison = [
        {"op": "INSERT", "ts": "2024-01-03T00:00:00", "seq": 20, "pk": 66,
         "status": "bad", "price": -1.0},
    ]
    _write_batch(log_dir / "b2.json", BATCH2)
    _write_batch(log_dir / "b3.json", poison)

    table = ManagedTable(spark, warehouse, SPEC)
    table.bootstrap(spark.createDataFrame([], IMAGE_SCHEMA))
    audits = {"published": 0, "aborted": 0}

    def gated_merge(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        v = table.stage_changes(batch_df, order_cols=("ts", "seq"))
        bad = table.read(version=v).filter(F.col("price") < 0).count()
        if bad:
            table.abort_staged(v)
            audits["aborted"] += 1
        else:
            table.publish(v)
            audits["published"] += 1

    stream = read_changelog_stream(
        spark, str(log_dir), changelog_schema(IMAGE_SCHEMA), max_files_per_trigger=1
    )
    q = (
        stream.writeStream.foreachBatch(gated_merge)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert audits["aborted"] == 1 and audits["published"] == 2, audits
    got = {r.pk: (r.status, r.price) for r in table.read().collect()}
    # clean batches landed; the poisoned batch left zero residue
    full_log = spark.read.schema(changelog_schema(IMAGE_SCHEMA)).json(
        str(log_dir)
    ).filter(F.col("price").isNull() | (F.col("price") >= 0))
    empty = spark.createDataFrame([], IMAGE_SCHEMA)
    expected_df = merge_changes(empty, full_log, keys=["pk"], order_cols=["ts", "seq"])
    expected = {r.pk: (r.status, r.price) for r in expected_df.collect()}
    assert got == expected
    assert 66 not in got
    assert not table.history()[-1].staged


def test_dedup_within_watermark_survives_batch_split(spark, tmp_path):
    """ADVICE r3 #1 closure: dropDuplicatesWithinWatermark's DISTINCT
    twin must hold under a MULTI-microbatch drain in arbitrary file
    order — a key first arriving in a late batch with an old event day
    must not be dropped as late data. The oversized watermark delay
    (exceeding the fixture's full event-time span) is the load-bearing
    fact; this test forces one file per trigger to exercise it."""
    events = load(spark, SF_DIR, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    stream_src = tmp_path / "events_split"
    # many files -> many microbatches, arbitrary per-file day mixtures
    events.repartition(8).write.parquet(str(stream_src))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_src))
        .withColumn("evt_day", F.date_trunc("day", "ts").cast("timestamp"))
        .withWatermark("evt_day", "3650 days")
        .select("user_id", "event_type", "evt_day")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "evt_day"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_split")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("dedup_split")
    expected = (
        events.select(
            "user_id",
            "event_type",
            F.date_trunc("day", "ts").cast("timestamp").alias("evt_day"),
        )
        .distinct()
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_stream_schema_evolution_mid_stream(spark, warehouse, tmp_path):
    """B4 x H7 (VERDICT r5 #5): an attribute that first appears in a
    LATER microbatch of one continuously-running query widens the
    target additively — no restart — and the drained state equals one
    batch merge over the union schema."""
    from dynamodb_zero_etl_s3tables_spark.streaming.cdc import (
        apply_changes_stream_evolving,
        read_raw_changelog_stream,
    )

    log_dir = tmp_path / "changelog"
    batch2_evolved = [dict(r, region=f"r{r['pk'] % 2}") for r in BATCH2]
    _write_batch(log_dir / "b1.json", BATCH1)           # no `region` yet
    _write_batch(log_dir / "b2.json", batch2_evolved)   # `region` appears

    table = ManagedTable(
        spark,
        warehouse,
        TableSpec(namespace="ns", name="stream_evolve", key_columns=("pk",),
                  order_columns=("seq",)),
    )
    raw = read_raw_changelog_stream(spark, str(log_dir), max_files_per_trigger=1)
    q = apply_changes_stream_evolving(table, raw, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert q.lastProgress is not None

    final = table.read()
    assert "region" in final.columns, "new attribute must widen the table"
    got = {r.pk: (r.status, r.price, r.region) for r in final.collect()}
    # rows last written before the attribute existed read NULL (additive)
    for pk in (3, 4, 5):
        assert got[pk] == ("new", float(pk), None)
    # rows from the evolved batch carry the new column
    assert got[1] == ("upd2", 12.0, "r1")
    assert got[7] == ("late", 70.0, "r1")
    assert 2 not in got

    # batch twin: one merge over the union schema reproduces the state
    evolved_schema = T.StructType(
        list(changelog_schema(IMAGE_SCHEMA).fields)
        + [T.StructField("region", T.StringType())]
    )
    full_log = spark.read.schema(evolved_schema).json(str(log_dir))
    empty = spark.createDataFrame(
        [], T.StructType([f for f in evolved_schema.fields if f.name not in ("op", "seq")])
    )
    expected_df = merge_changes(empty, full_log, keys=["pk"], order_cols=["ts", "seq"])
    expected = {r.pk: (r.status, r.price, r.region) for r in expected_df.collect()}
    assert got == expected

    # existing columns stay pinned to the target's types (no type fork)
    assert dict(final.dtypes)["price"] == "double"
    assert dict(final.dtypes)["pk"] == "bigint"


def test_evolving_sink_tolerates_keyonly_tombstone_batch(spark, tmp_path):
    """r8 review: a microbatch of key-only REMOVE records (the normal
    DynamoDB tombstone shape) killed the evolving stream with a
    columns-missing SchemaEvolutionError; absent target columns are
    now backfilled as typed NULLs."""
    import json as _json

    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.streaming.cdc import (
        apply_changes_stream_evolving,
        read_raw_changelog_stream,
    )
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog

    log = tmp_path / "log"
    log.mkdir()
    t = Catalog(spark, str(tmp_path / "wh")).create_table(
        TableSpec(namespace="ns", name="tomb", key_columns=("pk",))
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "A", 5.0), (2, "B", 6.0)], "pk long, status string, x double"
        )
    )
    (log / "b1.json").write_text(
        _json.dumps({"op": "REMOVE", "ts": 1, "seq": 1, "pk": 2}) + "\n"
    )
    q = apply_changes_stream_evolving(
        t,
        read_raw_changelog_stream(spark, str(log)),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert sorted(r.pk for r in t.read().collect()) == [1]


def test_evolving_sink_refuses_fractional_on_integral_column(spark, tmp_path):
    """r8 review: a fractional value arriving for a column pinned
    BIGINT was blind-cast (2.7 -> 2, silent truncation); it now
    refuses loudly."""
    import json as _json

    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.streaming.cdc import (
        apply_changes_stream_evolving,
        read_raw_changelog_stream,
    )
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog
    from dynamodb_zero_etl_s3tables_spark.table.merge import (
        SchemaEvolutionError,
    )

    log = tmp_path / "log"
    log.mkdir()
    t = Catalog(spark, str(tmp_path / "wh")).create_table(
        TableSpec(namespace="ns", name="frac", key_columns=("pk",))
    )
    t.bootstrap(spark.createDataFrame([(1, 7)], "pk long, x long"))
    (log / "b1.json").write_text(
        _json.dumps(
            {"op": "MODIFY", "ts": 1, "seq": 1, "pk": 1, "x": 2.7}
        )
        + "\n"
    )
    q = apply_changes_stream_evolving(
        t,
        read_raw_changelog_stream(spark, str(log)),
        str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception) as exc_info:
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
    assert "truncate" in str(exc_info.value)
    assert t.read().first().x == 7  # nothing committed


def test_changelog_schema_refuses_protocol_collision(spark):
    """r8 review: an image column named op/ts/seq would produce a
    duplicate-field record schema — refuse loudly."""
    from pyspark.sql import types as T

    from dynamodb_zero_etl_s3tables_spark.streaming.cdc import (
        changelog_schema,
    )

    with pytest.raises(ValueError, match="collide"):
        changelog_schema(
            T.StructType(
                [
                    T.StructField("pk", T.LongType()),
                    T.StructField("ts", T.TimestampType()),
                ]
            )
        )
