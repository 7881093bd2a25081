"""Derived-score invariants (FIXTURES.md cheatsheet; reference behavior
`grounding.py:259-270`, `confidence_analyzer.py:561-627`)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from knowledge_graph_system_spark.functions.vectors import unit_vec_py
from knowledge_graph_system_spark.operators.aggregates import (
    confidence_score,
    confidence_signals,
)
from knowledge_graph_system_spark.operators.scores import (
    grounding,
    polarity_axis,
    rel_projections,
)


def test_axis_is_unit_and_deterministic():
    a1, a2 = polarity_axis(), polarity_axis()
    assert a1 == a2
    assert math.isclose(sum(x * x for x in a1), 1.0, rel_tol=1e-12)


def test_positive_pole_projects_positive():
    """Each polarity pair's positive member must project higher than its
    negative member — the axis construction guarantees separation."""
    proj = rel_projections()
    for pos, neg in [("L0", "L1"), ("L2", "L3"), ("L4", "L5")]:
        assert proj[pos] > proj[neg]


def test_grounding_sign_invariants(spark):
    """Only-positive-family in-edges ⇒ grounding > 0; only-negative ⇒ < 0;
    grounding always ∈ [−1, 1]."""
    proj = rel_projections()
    pos_rel = max(proj, key=lambda r: proj[r] if r.startswith("L") else -9)
    neg_rel = min(proj, key=lambda r: proj[r] if r.startswith("L") else 9)
    edges = spark.createDataFrame(
        [
            ("a", "POSONLY", pos_rel, 0.9),
            ("b", "POSONLY", pos_rel, None),
            ("a", "NEGONLY", neg_rel, 0.8),
            ("a", "MIXED", pos_rel, 0.5),
            ("b", "MIXED", neg_rel, 0.5),
        ],
        "src string, dst string, rel_type string, confidence double",
    )
    g = {r["node_id"]: r["grounding"] for r in grounding(edges).collect()}
    assert g["POSONLY"] > 0 and g["NEGONLY"] < 0
    assert all(-1.0 <= v <= 1.0 for v in g.values())


def test_grounding_null_confidence_weighs_half(spark):
    proj = rel_projections()
    rel = max((r for r in proj if r.startswith("L")), key=lambda r: abs(proj[r]))
    edges = spark.createDataFrame(
        [("a", "X", rel, None)], "src string, dst string, rel_type string, confidence double"
    )
    g = grounding(edges).collect()[0]
    # single edge: weighted mean == proj regardless of weight, n_edges = 1
    assert g["n_edges"] == 1
    assert math.isclose(g["grounding"], round(proj[rel], 6), abs_tol=1e-6)


def test_confidence_saturation_bounds_and_monotonicity(spark):
    edges = spark.createDataFrame(
        [("s%d" % i, "hub", "L%d" % (i % 7), 0.5) for i in range(40)]
        + [("s0", "leaf", "L0", 0.5)],
        "src string, dst string, rel_type string, confidence double",
    )
    scores = {
        r["node_id"]: r for r in confidence_score(confidence_signals(edges)).collect()
    }
    hub, leaf = scores["hub"], scores["leaf"]
    assert 0.0 < leaf["confidence_score"] < hub["confidence_score"] < 1.0
    assert hub["confidence_level"] in ("high", "medium")
    assert leaf["confidence_level"] == "low"


def test_epistemic_status_classification(spark):
    """ADR-610 measurement: affirmative semantic types land positive
    (axis-aligned), contradictory ones negative, PLACED is HISTORICAL
    by the temporal-name rule, and every status is from the closed set."""
    from knowledge_graph_system_spark.operators.scores import (
        epistemic_status_measurement,
    )
    from tests.conftest import SF_DIR

    rows = {r["rel_type"]: r for r in
            epistemic_status_measurement(spark, SF_DIR).collect()}
    closed = {"WELL_GROUNDED", "MIXED_GROUNDING", "WEAK_GROUNDING",
              "POORLY_GROUNDED", "CONTRADICTED", "HISTORICAL",
              "INSUFFICIENT_DATA"}
    assert {r["epistemic_status"] for r in rows.values()} <= closed
    assert rows["PLACED"]["epistemic_status"] == "HISTORICAL"
    for t in ("L0", "L2", "L4"):  # affirmative family: positive grounding
        assert rows[t]["avg_grounding"] > 0, t
    for t in ("L1", "L3", "L5"):  # contradictory family: negative
        assert rows[t]["avg_grounding"] < 0, t
