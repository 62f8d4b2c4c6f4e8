"""Streaming windowed aggregation + dedup builders (SURVEY.md §2
H2-H6). Each returns a transformation applicable to either a
streaming or a batch DataFrame — the same code path, so the batch
twins in operators/stream_twins.py are literal oracles for the
streaming results (verified in tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; parquet plain timestamp[us] loads
    as TIMESTAMP_NTZ, so normalize the event-time column in place
    (session tz is UTC — the instant is unchanged). Shared by every
    streaming builder — the NTZ-normalization rule lives HERE only."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


#: module-internal alias kept for existing call sites
_event_time = event_time


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """H3 (+H2): tumbling event-time window aggregate."""
    if watermark and df.isStreaming:
        df = _event_time(df, ts_col)
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("win_start", F.col("w.start"))
        .withColumn("win_end", F.col("w.end"))
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """H4: sliding event-time window aggregate."""
    if watermark and df.isStreaming:
        df = _event_time(df, ts_col)
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(*aggs)
        .withColumn("win_start", F.col("w.start"))
        .withColumn("win_end", F.col("w.end"))
        .drop("w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """H5: session windows (gap-based) via session_window — Spark
    manages merge-on-overlap state; the batch twin is the gap-islands
    window query (operators/stream_twins.h05_session_window)."""
    if watermark and df.isStreaming:
        df = _event_time(df, ts_col)
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )


def stream_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """H6: streaming dropDuplicates; with a watermark the key state is
    garbage-collected past the horizon (bounded state at scale)."""
    if watermark and ts_col and df.isStreaming:
        df = _event_time(df, ts_col)
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(list(key_cols))
    return df.dropDuplicates(list(key_cols))
