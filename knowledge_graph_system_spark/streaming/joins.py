"""Stream-stream joins (SURVEY.md §2.10 family — beyond the reference,
which has no stream processing at all; this is the event-correlation
operator a 100 TB pipeline needs for attribution/sessionization).

Spark buffers both sides in watermark-bounded state: the time-range
condition lets the engine evict rows once the watermark passes
`click.ts + window`, so state is O(rate × window), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join: each purchase matched to same-user clicks in the
    preceding `window`. Both sides watermarked so the join state is
    bounded and evictable."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {window}"
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "amount",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_at"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_at"),
    )


def stream_enrich_static(
    events_stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: each micro-batch joins against a
    batch-side dimension — stateless (nothing buffered across
    triggers; the dim is re-resolved per batch, so a dim refresh is
    picked up without restarting the query).

    Scale: no broadcast hint — a hint would override the size
    threshold and force even a huge dimension through the driver, so
    the planner decides per batch via autoBroadcastJoinThreshold:
    small dims (the common case) broadcast, an oversized dim falls
    back to a per-batch shuffle join, still stateless. The stream side
    must keep its watermark column if a windowed aggregate follows
    (enrichment is a projection, not a stateful op)."""
    return events_stream.join(dim, key, how)
