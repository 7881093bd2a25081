"""Shared scale-shape guards.

`maybe_broadcast` is the counted-broadcast guard: hint a frame into a
broadcast join only when its measured row count is under the caller's
bound, else return it unhinted and let the planner (AQE) pick the join
strategy — past the bound the correct open-data plan is a shuffle
join, and a forced hint would blow the driver. This is the third
occurrence of the same defect class caught in three rounds (r8 IVF
tombstones, r9 LM count frames, r10 Cypher shortestPath frontier), so
the guard is now a shared util; the per-site thresholds stay local
constants because row width differs (ann.TOMBSTONE_BROADCAST_MAX and
lm.LM_COUNT_BROADCAST_MAX predate this util and keep their own guard
fns — consolidating them is an executed-path edit to rows outside the
current recording window, scheduled for their rotation round). The
count is a real job: callers should localCheckpoint frames whose
lineage is expensive so the count and the join share materialization.

`fan_out` is the parallelism floor for per-row-heavy stages that
inherit the scan's split count (explodes, Arrow mapInPandas decodes):
a small single-file probe input yields fewer splits than cores and
serializes the whole stage — the r9/r10 decade probes read the sf1
documents table as 2 splits, so the bigram explode (lm.py) and the
multimodal decode family each ran on 2 of 32 cores, measuring
near-linear (8.6x / 9.0x) where the plan itself is embarrassingly
parallel. When, and only when, input splits < defaultParallelism, one
round-robin repartition spreads the stage across the machine; at real
corpus scale (100 TB = tens of thousands of splits) the condition is
false and NO shuffle is added — the guard costs one partition-count
lookup, not a plan change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maybe_broadcast(
    df: DataFrame, max_rows: int, n_rows: int | None = None
) -> DataFrame:
    """Broadcast-hint `df` iff its row count is ≤ `max_rows`.

    Pass `n_rows` when the caller already knows the count (avoids the
    extra job); otherwise one count() is paid here.
    """
    if n_rows is None:
        n_rows = df.count()
    return F.broadcast(df) if n_rows <= max_rows else df


def fan_out(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def local_df(spark, data, schema) -> DataFrame:
    """`createDataFrame` for SMALL driver-side lists, in ONE partition.

    PySpark's `createDataFrame` parallelizes local data into
    `defaultParallelism` slices — a 9-row vocabulary or a 1-row stat
    frame becomes a 32-partition ExistingRDD scan, so every broadcast
    build over it runs 32 near-empty tasks and a cartesian/BNLJ of two
    such frames schedules 32x32 = 1024 tasks of pure overhead (measured
    15.8 s for the 36-row vocab pair join at sf0.1 — r17, guide §2.2
    "fewer, larger tasks"). NOT `.coalesce(1)`: each parent partition of
    a parallelized collection is evaluated through its own Python-runner
    round, and CoalesceExec chains all 32 sequentially into one task
    (measured 4 s per action, every action). `parallelize(data, 1)`
    builds the one-slice RDD directly (measured 0.18 s cold). Callers
    own the smallness contract — this is for seed/stat/codebook/
    vocabulary frames, not data tables.
    """
    return spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
