"""Count-min sketch: exact DuckDB parity, overestimate-only guarantee,
merge-by-sum, and never-seen items."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.cms import (
    cms_estimate,
    cms_merge,
    cms_sketch,
    t_cms_words,
    t_cms_words_oracle,
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


def test_cms_matches_duckdb(spark, duck):
    got = sorted(map(tuple, t_cms_words(spark, SF_DIR).collect()))
    want = sorted(map(tuple, duck.execute(t_cms_words_oracle()).fetchall()))
    assert got == want and len(got) == 20


def test_cms_never_underestimates(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 500).cast("string").alias("v")
    )
    exact = {r["v"]: r["n"] for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    items = df.select(F.col("v").alias("item")).distinct()
    est = {
        r["item"]: r["est_count"]
        for r in cms_estimate(cms_sketch(df, "v"), items).collect()
    }
    assert all(est[v] >= n for v, n in exact.items())
    # with 500 distinct over 4096 buckets collisions are rare: most exact
    assert sum(est[v] == n for v, n in exact.items()) > 450


def test_cms_merge_equals_whole(spark):
    df = spark.range(10_000).select((F.col("id") % 300).cast("string").alias("v"))
    a = cms_sketch(df.filter(F.col("v").cast("int") % 2 == 0), "v")
    b = cms_sketch(df.filter(F.col("v").cast("int") % 2 == 1), "v")
    merged = sorted(map(tuple, cms_merge(a, b).collect()))
    whole = sorted(map(tuple, cms_sketch(df, "v").collect()))
    assert merged == whole


def test_cms_unseen_item_estimates_zero_or_collision(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("v"))
    items = spark.createDataFrame([("zzz-never-seen",)], ["item"])
    est = cms_estimate(cms_sketch(df, "v"), items).collect()[0]["est_count"]
    assert est >= 0  # and with 100 items over 4096 buckets, almost surely 0
    assert est <= 100
