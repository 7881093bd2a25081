"""Annealing cycle: candidate detection + deterministic verb decisions
(reference `annealing_manager.py:328-455`, ADR-206 closed vocabulary)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.annealing import annealing_proposals
from tests.conftest import SF_DIR

VERBS = {"CLEAVE", "DISSOLVE", "MERGE", "RENAME", "NO_ACTION",
         "ESCALATE", "ADJUST_CONTROL"}


def test_cycle_shape_and_closed_vocabulary(spark):
    df = annealing_proposals(spark, SF_DIR)
    rows = df.collect()
    assert {r["verb"] for r in rows} <= VERBS
    kinds = {r["kind"] for r in rows}
    assert kinds == {"demotion", "promotion", "pressure"}

    # exactly one pressure signal per cycle
    press = [r for r in rows if r["kind"] == "pressure"]
    assert len(press) == 1 and 0.0 <= press[0]["score"] <= 1.0

    # demotion verbs carry the right targets
    for r in rows:
        if r["verb"] == "DISSOLVE":
            assert r["target"] == "primordial"
        if r["verb"] == "MERGE":
            assert r["target"] != r["subject"] and r["target"] != "primordial"
        if r["verb"] == "ESCALATE":
            assert r["target"] == "review"
        if r["verb"] == "NO_ACTION":
            assert r["target"] == "none"
        if r["verb"] == "RENAME":
            # target is the hub concept's name, never an existing ontology
            assert r["target"] not in {x["subject"] for x in rows}


def test_full_vocabulary_fires_at_driver_sf(spark):
    """At the driver's gate sf (0.01) the decision cascade emits the
    reference's complete closed vocabulary — every one of the six verbs
    (`annealing_decision_service.py`), plus the pressure signal."""
    df = annealing_proposals(spark, "/root/testdata/sf0.01")
    verbs = {r["verb"] for r in df.select("verb").distinct().collect()}
    assert verbs == VERBS


def test_executor_applies_rename_and_cleave(spark):
    """The executor rewrites membership for DISSOLVE / MERGE / RENAME
    and the single approved CLEAVE; untouched ontologies keep their
    counts (reference `proposal_executor.py:295-650`)."""
    from knowledge_graph_system_spark.operators.annealing import execute_proposals
    from knowledge_graph_system_spark.registry import Ctx

    props = {
        (r["verb"], r["subject"], r["target"])
        for r in annealing_proposals(spark, SF_DIR).collect()
    }
    dist = {r["ontology"]: r["n_nodes"] for r in execute_proposals(spark, SF_DIR).collect()}

    # every DISSOLVE subject's members left; primordial absorbed them
    dissolved = [s for v, s, _ in props if v == "DISSOLVE"]
    for s in dissolved:
        assert s not in dist
    if dissolved:
        assert dist.get("primordial", 0) > 0
    # renamed subjects disappear under their old name, appear under the new
    for v, s, t in props:
        if v == "RENAME":
            assert s not in dist and t in dist
    # exactly one approved CLEAVE (top score, ties by subject): its
    # nucleus's name is an ontology now
    cleaves = [
        r
        for r in annealing_proposals(spark, SF_DIR).collect()
        if r["verb"] == "CLEAVE"
    ]
    if cleaves:
        approved = sorted(cleaves, key=lambda r: (-r["score"], r["subject"]))[0]
        assert approved["target"] in dist
    # total node count is conserved by every rewrite
    n_nodes = Ctx.get(spark, SF_DIR).nodes.count()
    assert sum(dist.values()) == n_nodes


def test_promotions_respect_floors(spark):
    from knowledge_graph_system_spark.operators.annealing import MIN_DEGREE

    df = annealing_proposals(spark, SF_DIR)
    promos = df.filter(F.col("kind") == "promotion").collect()
    assert all(r["score"] >= MIN_DEGREE for r in promos)
    # ≤10 per source ontology is enforced upstream of the degree floor;
    # a concept never proposes a nucleus named like an existing ontology
    names = {r["target"].lower() for r in promos}
    onames = {"supply"} | {r["target"] for r in []}
    assert not (names & onames)
