"""Saved-query + artifact persistence (the reference's ADR-083 tables:
query_definitions save/recall/re-execute, artifacts epoch freshness)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from knowledge_graph_system_spark.plans.saved import (
    ArtifactStore,
    QueryStore,
    SavedQueryError,
)
from knowledge_graph_system_spark.registry import Ctx
from tests.conftest import SF_DIR

_CYPHER = "MATCH (c:Customer) WHERE c.weight > 9000 RETURN c.node_id AS id"
_PROGRAM = [
    {"op": "+", "source": {"kind": "match", "label": "Part", "min_weight": 905.0}},
    {"op": "-", "source": {"kind": "match", "max_weight": 915.0}},
]


def test_save_validates_fail_closed():
    s = QueryStore()
    with pytest.raises(Exception, match="V010"):
        s.save("bad", "cypher", {"cypher": "MATCH (n) DELETE n"})
    with pytest.raises(Exception, match="unknown operator"):
        s.save("bad", "program", {"statements": [{"op": "^", "source": {}}]})
    with pytest.raises(SavedQueryError, match="unknown definition_type"):
        s.save("bad", "block_diagram", {})
    with pytest.raises(SavedQueryError, match="needs a 'cypher' string"):
        s.save("bad", "cypher", {})
    assert s.names() == []  # nothing invalid was stored


def test_duplicate_name_needs_replace():
    s = QueryStore()
    s.save("q", "cypher", {"cypher": _CYPHER})
    with pytest.raises(SavedQueryError, match="already exists"):
        s.save("q", "cypher", {"cypher": _CYPHER})
    s.save("q", "cypher", {"cypher": _CYPHER}, replace=True)


def test_execute_by_name_matches_direct(spark):
    from knowledge_graph_system_spark.plans.cypher import compile_cypher

    s = QueryStore()
    s.save("heavy_customers", "cypher", {"cypher": _CYPHER})
    got = sorted(r["id"] for r in s.execute("heavy_customers", spark, SF_DIR).collect())
    want = sorted(
        r["id"] for r in compile_cypher(Ctx.get(spark, SF_DIR), _CYPHER).collect()
    )
    assert got == want and got


def test_saved_program_executes(spark):
    s = QueryStore()
    s.save("mid_parts", "program", {"statements": _PROGRAM})
    out = s.execute("mid_parts", spark, SF_DIR)
    ids = {r["node_id"] for r in out.select("node_id").collect()}
    want = {
        r["node_id"]
        for r in Ctx.get(spark, SF_DIR)
        .nodes.filter(
            (F.col("label") == "Part") & (F.col("weight") > 905.0) & ~(F.col("weight") < 915.0)
        )
        .collect()
    }
    assert ids == want and ids


def test_json_roundtrip_revalidates(spark):
    s = QueryStore()
    s.save("heavy_customers", "cypher", {"cypher": _CYPHER}, metadata={"k": "v"})
    s.save("mid_parts", "program", {"statements": _PROGRAM})
    text = s.to_json()

    s2 = QueryStore.from_json(text)
    assert s2.names() == ["heavy_customers", "mid_parts"]
    assert s2.get("heavy_customers").metadata == {"k": "v"}
    a = sorted(map(tuple, s.execute("heavy_customers", spark, SF_DIR).collect()))
    b = sorted(map(tuple, s2.execute("heavy_customers", spark, SF_DIR).collect()))
    assert a == b

    # a tampered file cannot smuggle an unvalidated definition in
    bad = text.replace("MATCH (c:Customer)", "CREATE (x:Evil)")
    with pytest.raises(Exception, match="V010"):
        QueryStore.from_json(bad)


def test_artifact_epoch_staleness(spark):
    """The artifact recomputes exactly when the committed watermark
    moves past its stamp — DerivedTable semantics through the store."""
    s = QueryStore()
    builds = []
    orig_execute = s.execute

    def counting_execute(name, sp, sf):
        builds.append(name)
        return orig_execute(name, sp, sf)

    s.execute = counting_execute  # type: ignore[method-assign]
    s.save("heavy_customers", "cypher", {"cypher": _CYPHER})
    arts = ArtifactStore(s)

    art = arts.materialize("a1", "heavy_customers", spark, SF_DIR)
    assert builds == ["heavy_customers"]
    assert arts.fresh("a1", spark, SF_DIR)
    epoch0 = art.graph_epoch
    assert epoch0 >= 0

    # same watermark → cached, no rebuild
    arts.materialize("a1", "heavy_customers", spark, SF_DIR)
    assert builds == ["heavy_customers"]

    # watermark moves → stale is detected and the rebuild happens
    art.derived.stamp = epoch0 - 1
    assert not arts.fresh("a1", spark, SF_DIR)
    arts.materialize("a1", "heavy_customers", spark, SF_DIR)
    assert builds == ["heavy_customers", "heavy_customers"]
    assert arts.fresh("a1", spark, SF_DIR)
    assert arts.result("a1").count() == s.execute("heavy_customers", spark, SF_DIR).count()
