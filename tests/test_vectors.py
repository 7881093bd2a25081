"""Vector function + V1 search unit tests (reference parity: the seeded
deterministic-embedding strategy of `mock_ai_provider.py:176-213`)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from knowledge_graph_system_spark.functions.vectors import (
    DEFAULT_DIM,
    dot_expr,
    lit_vec,
    unit_vec_py,
    with_unit_vec,
)
from knowledge_graph_system_spark.operators.vector import vector_search


def test_unit_vec_py_is_unit_and_deterministic():
    v1 = unit_vec_py("seed-a")
    v2 = unit_vec_py("seed-a")
    assert v1 == v2
    assert len(v1) == DEFAULT_DIM
    assert math.isclose(sum(x * x for x in v1), 1.0, rel_tol=1e-12)
    assert unit_vec_py("seed-b") != v1


def test_spark_unit_vec_matches_python(spark):
    df = spark.createDataFrame([("seed-a",), ("seed-b",)], "seed string")
    rows = {r["seed"]: r["embedding"] for r in with_unit_vec(df, "seed").collect()}
    assert rows["seed-a"] == unit_vec_py("seed-a")
    assert rows["seed-b"] == unit_vec_py("seed-b")


def test_self_similarity_is_one(spark):
    df = spark.createDataFrame([("x",)], "seed string")
    df = with_unit_vec(df, "seed")
    sim = df.select(
        F.round(dot_expr("embedding", "embedding"), 9).alias("s")
    ).collect()[0]["s"]
    assert sim == 1.0


def test_vector_search_topk_threshold(ctx):
    q = unit_vec_py("query:test")
    out = vector_search(ctx.nodes_emb, q, threshold=0.2, k=10).collect()
    assert len(out) <= 10
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0.2 for s in scores)
