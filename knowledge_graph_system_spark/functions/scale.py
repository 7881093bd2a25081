"""Shared scale-shape guards.

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


def fan_out(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
