"""Stream-stream interval join (Structured Streaming's two-stream
join with event-time bounds). The one H-family join shape the
stream-static path (h09) doesn't cover: BOTH sides are unbounded, so
Spark buffers each side in keyed state and the time-range condition
is what lets the watermark expire that state — without the bound the
state grows forever.

The builder takes batch or streaming frames (same code path, the
repo's twin-law discipline): watermarks apply only in the streaming
form, and the join condition — key equality plus a bounded time
range — is identical in both, so draining a file-backed stream must
equal the batch join (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.streaming.windows import (
    event_time as _event_time,
)


def purchase_click_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Attribute each purchase to every click by the same user within
    the preceding ``lookback`` window.

    Inputs: purchases (purchase_id, user_id, p_ts), clicks
    (click_id, user_id, c_ts) — batch or streaming. In the streaming
    form both sides carry watermarks and the two-sided time bound
    (c_ts in [p_ts - lookback, p_ts]) lets Spark GC buffered rows
    older than watermark + lookback; state is bounded by the join
    window, not stream length. The key equality keeps it a hash
    join — one shuffle per side on user_id.

    ``how="left_outer"`` keeps purchases with NO qualifying click
    (null click columns) — the conversion-without-attribution row an
    inner join silently drops. In the streaming form, Spark emits the
    null-padded row only once the purchase-side watermark passes the
    end of its lookback window (the point where a matching click can
    no longer arrive); the batch twin is the plain left join."""
    p, c = purchases, clicks
    if p.isStreaming:
        p = _event_time(p, "p_ts").withWatermark("p_ts", watermark)
    if c.isStreaming:
        c = _event_time(c, "c_ts").withWatermark("c_ts", watermark)
    c = c.withColumnRenamed("user_id", "c_user")
    cond = (
        (p["user_id"] == c["c_user"])
        & (c["c_ts"] >= p["p_ts"] - F.expr(f"INTERVAL {lookback}"))
        & (c["c_ts"] <= p["p_ts"])
    )
    return p.join(c, cond, how).select(
        "purchase_id", "click_id", "user_id", "p_ts", "c_ts"
    )
