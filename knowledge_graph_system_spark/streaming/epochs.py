"""Epoch / freshness contract (SURVEY.md §2.10 ST1-ST3).

Reference mechanism: an append-only epoch event log with a committed
watermark; derived state (grounding caches, catalog) is stamped with the
epoch it was computed at and recomputed when the committed epoch moves
(`/root/reference/api/app/lib/age_client/ingestion.py:31-152`,
`api/app/lib/freshness.py`, two-tier caches `grounding.py:55-68,647-732`).

Spark-first: the epoch column + a committed watermark IS the snapshot
isolation — `WHERE epoch <= committed` gives repeatable reads over an
append-only table, and derived tables carry their source stamp. No
pinned connections, no generation counters: a stale derived table is
detected by comparing stamps and rebuilt with one deterministic job.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Ctx, query

EPOCH_BUCKET = 100  # events per epoch in the demo clock


def with_epoch(events: DataFrame, bucket: int = EPOCH_BUCKET) -> DataFrame:
    """Stamp each event with its epoch (monotone event_id buckets)."""
    return events.withColumn("epoch", (F.col("event_id") / bucket).cast("long"))


def committed_epoch(events: DataFrame, bucket: int = EPOCH_BUCKET) -> int:
    """The committed watermark: last FULLY-INGESTED epoch (an epoch is
    committed when its successor has started — the reference's
    record/complete handshake collapsed to a monotone rule)."""
    mx = events.agg(F.max("event_id").alias("m")).collect()[0]["m"]
    return max(-1, mx // bucket - 1) if mx is not None else -1


def snapshot(stamped: DataFrame, committed: int) -> DataFrame:
    """Repeatable read: only rows from committed epochs."""
    return stamped.filter(F.col("epoch") <= committed)


@dataclass
class DerivedTable:
    """An epoch-stamped derived table (ST2): recompute only when the
    committed watermark has moved past the stamp."""

    build: Callable[[int], DataFrame]
    stamp: int = -2
    df: DataFrame | None = None

    def refresh_if_stale(self, committed: int) -> DataFrame:
        if self.df is None or committed > self.stamp:
            self.df = self.build(committed).localCheckpoint(eager=True)
            self.stamp = committed
        return self.df


@query(
    "st_epoch_snapshot",
    oracle=f"""
WITH stamped AS (SELECT *, event_id // {EPOCH_BUCKET} AS epoch FROM events),
committed AS (SELECT greatest(-1, max(event_id) // {EPOCH_BUCKET} - 1) AS c FROM events)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value,
       CAST(max(epoch) AS BIGINT) AS latest_epoch,
       CAST((SELECT c FROM committed) AS BIGINT) AS committed_epoch
FROM stamped WHERE epoch <= (SELECT c FROM committed)
GROUP BY user_id
""",
)
def st_epoch_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived per-user stats over the committed snapshot only — rows
    from the in-flight epoch are excluded, and the derivation carries
    its watermark stamp."""
    ctx = Ctx.get(spark, sf_dir)
    stamped = with_epoch(ctx.tables["events"])
    committed = committed_epoch(ctx.tables["events"])
    return (
        snapshot(stamped, committed)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("epoch").alias("latest_epoch"),
            F.lit(committed).cast("long").alias("committed_epoch"),
        )
    )
