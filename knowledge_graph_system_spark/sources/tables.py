"""Parquet table loaders for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``/root/testdata/sf*/``.

Scale posture: ``spark.read.parquet`` gives us predicate pushdown +
column pruning for free; we never collect these to the driver. At
100 TB the same loaders point at a partitioned parquet/Delta layout —
nothing here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# TIMESTAMP(NANOS) parquet columns, read as nanos-long (see session.py)
# and converted to microsecond timestamps here — matching DuckDB's
# TIMESTAMP_NS → TIMESTAMP(µs) truncation so oracle comparisons agree.
_NANO_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver may hand us a session built without this flag; it's a
    # runtime-settable conf, and without it TIMESTAMP(NANOS) parquet
    # columns abort the scan with PARQUET_TYPE_ILLEGAL
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp rendering must be tz-stable vs the tz-naive DuckDB oracle
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # integer div: nanos ~1.7e18 would lose precision through a double
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
