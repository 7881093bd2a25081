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
