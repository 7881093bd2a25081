"""GraphProgram DSL unit tests — mirrors the reference's pure-operator
suite (`tests/unit/test_program_operators.py`, `test_program_executor.py`,
`test_program_validation.py` in /root/reference)."""

from __future__ import annotations

import pytest

from knowledge_graph_system_spark.plans.program import (
    ProgramValidationError,
    Result,
    WorkingGraph,
    execute_program,
    op_assert,
    op_difference,
    op_intersect,
    op_optional,
    op_union,
    validate_program,
)
from knowledge_graph_system_spark.plans.program import ProgramAborted


def _wg(spark, nodes, links):
    return WorkingGraph(
        nodes=spark.createDataFrame(nodes, "node_id string, weight double"),
        links=spark.createDataFrame(links, "src string, dst string, rel_type string"),
    )


def _r(spark, nodes, links=None):
    return Result(
        nodes=spark.createDataFrame(nodes, "node_id string, weight double"),
        links=spark.createDataFrame(links, "src string, dst string, rel_type string")
        if links is not None
        else None,
    )


@pytest.fixture
def w(spark):
    return _wg(
        spark,
        [("a", 1.0), ("b", 2.0), ("c", 3.0)],
        [("a", "b", "R"), ("b", "c", "R")],
    )


def test_union_dedups_and_w_wins(spark, w):
    r = _r(spark, [("c", 99.0), ("d", 4.0)])
    out = op_union(w, r)
    rows = {x["node_id"]: x["weight"] for x in out.nodes.collect()}
    assert rows == {"a": 1.0, "b": 2.0, "c": 3.0, "d": 4.0}  # W's c wins


def test_difference_cascades_dangling_links(spark, w):
    out = op_difference(w, _r(spark, [("b", 2.0)]))
    assert {x["node_id"] for x in out.nodes.collect()} == {"a", "c"}
    assert out.links.count() == 0  # both links touched b


def test_intersect(spark, w):
    out = op_intersect(w, _r(spark, [("b", 0.0), ("c", 0.0), ("z", 0.0)]))
    assert {x["node_id"] for x in out.nodes.collect()} == {"b", "c"}
    assert [tuple(r) for r in out.links.select("src", "dst").collect()] == [("b", "c")]


def test_optional_noop_on_empty(spark, w):
    out = op_optional(w, _r(spark, []))
    assert out.nodes.count() == 3


def test_assert_aborts_on_empty(spark, w):
    with pytest.raises(ProgramAborted):
        op_assert(w, _r(spark, []))


def test_dangling_invariant_after_every_op(spark, w):
    """FIXTURES invariant: after any op, every link endpoint ∈ W nodes."""
    for op, r in [
        (op_union, _r(spark, [("d", 4.0)], [("c", "d", "R"), ("x", "y", "R")])),
        (op_difference, _r(spark, [("a", 0.0)])),
        (op_intersect, _r(spark, [("a", 0.0), ("b", 0.0)])),
    ]:
        out = op(w, r)
        ids = {x["node_id"] for x in out.nodes.collect()}
        for link in out.links.collect():
            assert link["src"] in ids and link["dst"] in ids


def test_validator_rejects_bad_programs():
    with pytest.raises(ProgramValidationError):
        validate_program([])
    with pytest.raises(ProgramValidationError):
        validate_program([{"op": "*", "source": {}}])
    with pytest.raises(ProgramValidationError):
        validate_program([{"op": "+"}])  # no source
    deep = [{"op": "+", "source": {}}]
    for _ in range(4):
        deep = [{"if": {"cond": "has_results"}, "source": {}, "then": deep}]
    with pytest.raises(ProgramValidationError):
        validate_program(deep)
    with pytest.raises(ProgramValidationError):
        validate_program([{"if": {"cond": "count_gte"}, "source": {}, "then": [{"op": "+", "source": {}}]}])


def test_executor_conditionals_and_log(spark, w):
    calls = []

    def dispatch(source):
        calls.append(source["name"])
        if source["name"] == "empty":
            return _r(spark, [])
        return _r(spark, [("d", 4.0)])

    program = [
        {"op": "+", "source": {"name": "d"}},
        {
            "if": {"cond": "empty"},
            "source": {"name": "empty"},
            "then": [{"op": "-", "source": {"name": "d"}}],
            "else": [{"op": "+", "source": {"name": "never"}}],
        },
    ]
    res = execute_program(program, dispatch, w)
    assert not res.aborted
    assert {x["node_id"] for x in res.working.nodes.collect()} == {"a", "b", "c"}
    assert [s.op for s in res.log] == ["+", "if:empty", "-"]
    assert calls == ["d", "empty", "d"]


def test_executor_abort_surfaces(spark, w):
    res = execute_program(
        [{"op": "!", "source": {"name": "empty"}}],
        lambda s: _r(spark, []),
        w,
    )
    assert res.aborted and "empty" in res.abort_reason
