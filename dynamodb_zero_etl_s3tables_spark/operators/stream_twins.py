"""Batch twins of the streaming operators (SURVEY.md §2 H2-H6).

Every streaming op in streaming/ has a deterministic batch-equivalent
here so the DuckDB oracle can check the semantics (FIXTURES.md §C);
the true readStream/writeStream forms are exercised in tests/ with
availableNow triggers and must produce byte-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dynamodb_zero_etl_s3tables_spark.operators.registry import DSUM, dsum, query
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load


@query(
    "h02_watermark_twin",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_recent, {DSUM('value')} AS recent_value
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
    GROUP BY user_id
    """,
)
def h02_watermark_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2: watermark/late-data-drop twin — keep only rows within the
    watermark horizon of max event time (scalar-subquery max; in
    streaming this is withWatermark state eviction)."""
    e = load(spark, sf_dir, "events")
    horizon = e.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("h")
    )
    return (
        e.join(F.broadcast(horizon))
        .filter(F.col("ts") >= F.col("h"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_recent"), dsum("value").alias("recent_value"))
    )


@query(
    "h03_tumbling_window",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS win_start,
           event_type,
           COUNT(*) AS n_events,
           {DSUM('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def h03_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: tumbling-window aggregate (1-day) via Spark's window()
    generator — start timestamps equal DuckDB's date_trunc buckets."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "h04_sliding_window",
    oracle=f"""
    WITH buckets AS (
      SELECT e.*, CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP)
                    - (INTERVAL 1 HOUR * x.i) AS win_start
      FROM events e
      CROSS JOIN (SELECT UNNEST([0,1,2,3,4,5]) AS i) x
    )
    SELECT win_start, COUNT(*) AS n_events, {DSUM('value')} AS total_value
    FROM buckets
    WHERE ts >= win_start AND ts < win_start + INTERVAL 6 HOUR
    GROUP BY win_start
    """,
)
def h04_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: sliding window (6h length, 1h slide) — each event lands in
    6 overlapping windows; Spark's window() generator expands them,
    the oracle replays the expansion with an explicit bucket cross."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "total_value")
    )


@query(
    "h05_session_window",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events, {DSUM('value')} AS session_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def h05_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: session windows (30-min gap) via the gap-islands trick —
    lag + cumulative flag sum — checkable in plain SQL, unlike the
    streaming session_window() state (same semantics; tests compare
    the streaming form against this twin)."""
    e = load(spark, sf_dir, "events")
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_order)
    # microsecond-exact gap comparison (second-truncated casts would
    # disagree with the oracle on sub-second boundaries)
    flagged = e.withColumn(
        "new_session",
        F.when(
            prev_ts.isNull()
            | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    w_cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(w_cum))
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value").alias("session_value"),
    )


@query(
    "h06_stream_dedup_twin",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def h06_stream_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: streaming dropDuplicates twin — first arrival per
    (user_id, event_type) in event-time order."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )
