"""HyperLogLog sketch: DuckDB differential, mergeability, accuracy."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
    t_hll_words,
    t_hll_words_oracle,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    yield con
    con.close()


def test_hll_matches_duckdb(spark, duck):
    got = sorted(map(tuple, t_hll_words(spark, SF_DIR).collect()))
    want = sorted(map(tuple, duck.execute(t_hll_words_oracle()).fetchall()))
    assert got == want and len(got) > 0


def test_hll_accuracy_on_known_cardinality(spark):
    """5000 distinct ids: the estimate must land within 3 standard
    errors (3 * 1.04 / sqrt(256) ~ 19.5%)."""
    df = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    est = hll_distinct(df, "v").collect()[0]["est_distinct"]
    assert abs(est - 5000) / 5000 < 0.195


def test_hll_merge_equals_whole(spark):
    """The sketch property that matters at 100 TB: registers built on
    disjoint shards and merged give EXACTLY the whole-corpus registers
    (and therefore the identical estimate)."""
    df = spark.range(4000).select(F.col("id").cast("string").alias("v"))
    a = hll_registers(df.filter(F.col("id") % 2 == 0), "v")
    b = hll_registers(df.filter(F.col("id") % 2 == 1), "v")
    merged = sorted(map(tuple, hll_merge(a, b).collect()))
    whole = sorted(map(tuple, hll_registers(df, "v").collect()))
    assert merged == whole
    est_m = hll_estimate(hll_merge(a, b)).collect()[0]["est_distinct"]
    est_w = hll_estimate(hll_registers(df, "v")).collect()[0]["est_distinct"]
    assert est_m == est_w


def test_hll_duplicates_do_not_move_estimate(spark):
    """Cardinality, not volume: replicating every row 5x leaves the
    registers bit-identical."""
    df = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    df5 = df.crossJoin(spark.range(5).select(F.lit(1).alias("_x"))).select("v")
    assert sorted(map(tuple, hll_registers(df5, "v").collect())) == sorted(
        map(tuple, hll_registers(df, "v").collect())
    )


def test_hll_small_range_correction(spark):
    """Tiny cardinalities hit the linear-counting branch and stay
    near-exact."""
    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    est = hll_distinct(df, "v").collect()[0]["est_distinct"]
    assert abs(est - 10) < 1.0


def test_hll_plan_is_two_aggregations_no_udf(spark):
    df = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    plan = hll_distinct(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # register build + estimate: two-stage hash aggregations only
    assert "HashAggregate" in plan and "CartesianProduct" not in plan
