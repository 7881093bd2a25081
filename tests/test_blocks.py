"""Block-compiler parity: the 17 web builder block kinds compile into
GraphProgram IR and execute with the reference's per-block semantics
(`web/src/lib/blockCompiler.ts:167-246`)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from knowledge_graph_system_spark.plans.blocks import (
    BLOCK_KINDS,
    compile_blocks,
    run_blocks,
)
from knowledge_graph_system_spark.registry import Ctx
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bctx(spark):
    return Ctx.get(spark, SF_DIR)


def test_all_17_kinds_compile():
    assert len(BLOCK_KINDS) == 17
    blocks = [
        {"type": "start"},
        {"type": "search", "params": {"query": "x"}},
        {"type": "vectorSearch", "params": {"query": "q"}},
        {"type": "sourceSearch", "params": {"query": "q"}},
        {"type": "selectConcept", "params": {"concept_id": "C1"}},
        {"type": "neighborhood", "params": {"concept_id": "C1"}},
        {"type": "pathTo", "params": {"from_id": "C1", "to_id": "S1"}},
        {"type": "filterOntology", "params": {"ontology": "BUILDING"}},
        {"type": "filterEdge", "params": {"rel_types": ["PLACED"]}},
        {"type": "filterNode", "params": {"min_weight": 0.0}},
        {"type": "and"},
        {"type": "or"},
        {"type": "not", "params": {"exclude_pattern": "z"}},
        {"type": "limit", "params": {"n": 5}},
        {"type": "epistemicFilter", "params": {"include_statuses": ["AFFIRMATIVE"]}},
        {"type": "enrich"},
        {"type": "end"},
    ]
    stmts, post = compile_blocks(blocks)
    assert len(stmts) == 9  # generative + set-op blocks
    assert [d["kind"] for d in post] == ["filter_edge", "limit", "epistemic"]
    with pytest.raises(ValueError, match="unknown block"):
        compile_blocks([{"type": "teleport"}])


def test_source_search_and_ontology_filter(bctx):
    """The two kinds the registered demo chain omits: sourceSearch adds
    Parts linked to matched Orders; filterOntology intersects on it."""
    nodes, links = run_blocks(bctx, [
        {"type": "start"},
        {"type": "sourceSearch",
         "params": {"query": "query:so", "similarity": 0.3, "limit": 10}},
        {"type": "filterOntology", "params": {"ontology": "Brand#11"}},
        {"type": "end"},
    ])
    rows = nodes.collect()
    assert all(r["label"] == "Part" and r["ontology"] == "Brand#11" for r in rows)
    assert links.count() == 0  # search_sources contributes no links


def test_limit_reprunes_links(bctx):
    """After the terminal LIMIT, surviving links must connect surviving
    nodes only (dangling invariant holds through directives)."""
    nodes, links = run_blocks(bctx, [
        {"type": "neighborhood", "params": {"concept_id": "C1", "depth": 2}},
        {"type": "limit", "params": {"n": 5}},
    ])
    ids = {r["node_id"] for r in nodes.collect()}
    assert len(ids) == 5
    for r in links.collect():
        assert r["src"] in ids and r["dst"] in ids


def test_path_to_corridor(bctx):
    """path_to yields the shortest-path corridor: every corridor node
    sits on some shortest C1→S1 path, endpoints included."""
    nodes, links = run_blocks(bctx, [
        {"type": "pathTo", "params": {"from_id": "C1", "to_id": "S1"}},
    ])
    ids = {r["node_id"] for r in nodes.collect()}
    assert "C1" in ids and "S1" in ids
    # C1→O→P→S1: corridor nodes are exactly these four labels' prefixes
    assert {i[0] for i in ids} <= {"C", "O", "P", "S"}
    # links all advance one hop along a shortest path
    assert links.count() > 0
