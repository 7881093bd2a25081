"""PageRank + label propagation: chained-CTE DuckDB differentials,
hand-verified semantics on a toy graph, and invariants."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.graphalgo import (
    g_communities,
    g_communities_oracle,
    g_pagerank,
    g_pagerank_oracle,
    label_propagation,
    pagerank,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_pagerank_matches_duckdb_top15(spark, duck):
    got = [tuple(r) for r in g_pagerank(spark, SF_DIR).collect()]
    want = [tuple(r) for r in duck.execute(g_pagerank_oracle()).fetchall()]
    assert len(got) == 15
    assert got == want


def test_communities_match_duckdb(spark, duck):
    got = sorted(map(tuple, g_communities(spark, SF_DIR).collect()))
    want = sorted(map(tuple, duck.execute(g_communities_oracle()).fetchall()))
    assert got == want and len(got) > 0


def test_pagerank_toy_graph_hand_check(spark):
    """Chain a->b->c with a dangling c: after enough sweeps b outranks
    a, c outranks b (it receives b's whole mass), and ranks sum to 1."""
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], ["node_id"])
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    out = {r["node_id"]: r["rank"] for r in pagerank(nodes, edges, iters=10).collect()}
    assert out["c"] > out["b"] > out["a"]
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_mass_conserved_on_graph(spark):
    from knowledge_graph_system_spark.registry import Ctx

    ctx = Ctx.get(spark, SF_DIR)
    pr = pagerank(ctx.nodes, ctx.edges, iters=5)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-3)


def test_lpa_toy_two_cliques(spark):
    """Two triangles joined by nothing: every node converges to its
    clique's smallest id."""
    nodes = spark.createDataFrame([(x,) for x in "abcxyz"], ["node_id"])
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z")],
        ["src", "dst"],
    )
    out = {
        r["node_id"]: r["community"]
        for r in label_propagation(nodes, edges, iters=4).collect()
    }
    assert out["a"] == out["b"] == out["c"]
    assert out["x"] == out["y"] == out["z"]
    assert out["a"] != out["x"]


def test_weighted_sssp_matches_duckdb(spark, duck):
    from knowledge_graph_system_spark.operators.graphalgo import (
        g_weighted_sssp,
        g_weighted_sssp_oracle,
    )

    got = [tuple(r) for r in g_weighted_sssp(spark, SF_DIR).collect()]
    want = [tuple(r) for r in duck.execute(g_weighted_sssp_oracle()).fetchall()]
    assert got == want and len(got) == 25


def test_weighted_distances_toy_hand_check(spark):
    """Two routes a->c: direct cost 0.9 vs a->b->c cost 0.1 + 0.1 —
    Bellman-Ford must prefer the two-hop route, and an extra sweep
    cannot change a settled distance."""
    from knowledge_graph_system_spark.operators.graphalgo import (
        weighted_distances,
    )

    edges = spark.createDataFrame(
        [("a", "c", 0.1), ("a", "b", 0.9), ("b", "c", 0.9)],
        ["src", "dst", "confidence"],
    )
    # cost = 1 - confidence: a->c = 0.9; a->b->c = 0.1 + 0.1 = 0.2
    d2 = {r["node_id"]: r["dist"] for r in weighted_distances(edges, ["a"], sweeps=2).collect()}
    d4 = {r["node_id"]: r["dist"] for r in weighted_distances(edges, ["a"], sweeps=4).collect()}
    assert d2["c"] == 0.2 and d2["b"] == 0.1 and d2["a"] == 0.0
    assert d4 == d2
