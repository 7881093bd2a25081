"""Property-based tests (hypothesis) over the pure layers — the engine's
determinism contracts hold for ALL inputs, not just the fixtures."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_graph_system_spark.functions.vectors import unit_vec_py
from knowledge_graph_system_spark.plans.guard import GuardError, guard_query
from knowledge_graph_system_spark.plans.program import (
    ProgramValidationError,
    validate_program,
)

_seed = st.text(min_size=0, max_size=40)


@given(_seed)
@settings(max_examples=200, deadline=None)
def test_unit_vec_always_unit_and_stable(seed):
    v = unit_vec_py(seed)
    assert len(v) == 16
    assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)
    assert v == unit_vec_py(seed)


@given(_seed, _seed)
@settings(max_examples=100, deadline=None)
def test_unit_vec_distinct_seeds_differ(a, b):
    if a != b:
        assert unit_vec_py(a) != unit_vec_py(b)


_ident = st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True)


@given(_ident, _ident)
@settings(max_examples=100, deadline=None)
def test_guard_never_accepts_write_keywords(table, col):
    for kw in ("insert into", "delete from", "drop table", "update"):
        try:
            out = guard_query(f"SELECT {col} FROM {table} WHERE 1=1; {kw} {table}")
            raise AssertionError(f"guard accepted {out!r}")
        except GuardError:
            pass


@given(_ident)
@settings(max_examples=100, deadline=None)
def test_guard_output_always_limited_select(table):
    out = guard_query(f"SELECT * FROM {table}")
    assert re.match(r"(?is)^\s*select\b", out)
    assert re.search(r"\bLIMIT \d+\s*$", out)


_op = st.sampled_from(["+", "-", "&", "?", "!"])
_stmt = st.fixed_dictionaries({"op": _op, "source": st.just({"kind": "x"})})


@given(st.lists(_stmt, min_size=1, max_size=10))
@settings(max_examples=100, deadline=None)
def test_validator_accepts_all_flat_programs(program):
    validate_program(program)  # must not raise


@given(st.lists(_stmt, min_size=1, max_size=3), st.integers(min_value=4, max_value=6))
@settings(max_examples=50, deadline=None)
def test_validator_rejects_deep_nesting(body, depth):
    prog = body
    for _ in range(depth):
        prog = [{"if": {"cond": "has_results"}, "source": {}, "then": prog}]
    try:
        validate_program(prog)
        raise AssertionError("deep nesting accepted")
    except ProgramValidationError:
        pass


# ---------------------------------------------------------------------------
# Cypher WHERE parser: OR/AND precedence holds for arbitrary flat trees
# ---------------------------------------------------------------------------

_cmp = st.sampled_from([">", "<", ">=", "<=", "=", "<>"])
_val = st.integers(min_value=-99, max_value=99)
_leaf = st.tuples(_cmp, _val)
_conj = st.lists(_leaf, min_size=1, max_size=3)
_tree = st.lists(_conj, min_size=1, max_size=3)


@given(_tree)
@settings(max_examples=60, deadline=None)
def test_where_or_and_precedence_matches_reference_tree(spark, tree):
    """Render a random [[leaf AND leaf...] OR [...]] tree to WHERE text,
    compile through the Cypher parser, and compare against the Column
    built directly with the same precedence — string-identical plans.
    Column construction only; no Spark jobs."""
    from functools import reduce

    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.plans.cypher import _compile_where, _Scope

    scope = _Scope(cols={"n.weight": "n__weight"})
    spark_ops = {
        ">": lambda c, v: c > v, "<": lambda c, v: c < v,
        ">=": lambda c, v: c >= v, "<=": lambda c, v: c <= v,
        "=": lambda c, v: c == v, "<>": lambda c, v: c != v,
    }
    text = " OR ".join(
        " AND ".join(f"n.weight {op} {val}" for op, val in conj)
        for conj in tree
    )
    got = _compile_where(scope, text)
    col = F.col("n__weight")
    expect = reduce(
        lambda a, b: a | b,
        [
            reduce(lambda a, b: a & b,
                   [spark_ops[op](col, F.lit(val)) for op, val in conj])
            for conj in tree
        ],
    )
    assert str(got) == str(expect)


_label = st.sampled_from([None, "Customer", "Order", "Part"])
_direction = st.sampled_from(["->", "<-", "-"])
_rel = st.sampled_from([None, "PLACED", "L0", "PLACED|L0", "L0|L1|SUPPLIED_BY"])


@given(st.lists(st.tuples(_direction, _rel, _label), min_size=0, max_size=3))
@settings(max_examples=80, deadline=None)
def test_cypher_pattern_parse_roundtrip(chain):
    """Render a random linear pattern, parse it, and check the parsed
    structure matches what was rendered — node count, labels, edge
    directions, rel types. Pure parsing, no Spark."""
    from knowledge_graph_system_spark.plans.cypher import _parse_pattern

    text = "(n0)"
    for i, (direction, rel, label) in enumerate(chain, start=1):
        e = f"[:{rel}]" if rel else ""
        arrow = {"->": f"-{e}->", "<-": f"<-{e}-", "-": f"-{e}-"}[direction]
        lbl = f":{label}" if label else ""
        text += f"{arrow}(n{i}{lbl})"
    nodes, edges, _ = _parse_pattern(text)
    assert len(nodes) == len(chain) + 1
    assert len(edges) == len(chain)
    for i, (direction, rel, label) in enumerate(chain):
        # r8: the parser stores a type TUPLE ([:A|B] alternation)
        assert edges[i].rel_types == (tuple(rel.split("|")) if rel else None)
        assert edges[i].direction == {"->": "out", "<-": "in", "-": "both"}[direction]
        assert nodes[i + 1].label == label


def test_duckdb_libm_parity_pow_ln():
    """The oracle discipline for smp_temperature_mix (pow(x, 0.5)) and
    weighted_sample (ln) leans on Python and DuckDB sharing a libm:
    pin that assumption BITWISE over a deterministic sweep, so a
    toolchain change that breaks it fails here before it flips a
    graded row at the round boundary."""
    import math
    import random
    import struct

    import duckdb

    con = duckdb.connect()
    rnd = random.Random(42)
    for _ in range(2000):
        n = rnd.randint(1, 10**9)
        total = n + rnd.randint(0, 10**9)
        py = (n / total) ** 0.5
        db = con.execute(
            "SELECT pow(CAST(? AS DOUBLE) / CAST(? AS DOUBLE), 0.5)", [n, total]
        ).fetchone()[0]
        assert struct.pack("d", py) == struct.pack("d", db), (n, total)
    for _ in range(2000):
        x = (rnd.randint(0, 9999) + 0.5) / 10000.0
        assert struct.pack("d", math.log(x)) == struct.pack(
            "d", con.execute("SELECT ln(CAST(? AS DOUBLE))", [x]).fetchone()[0]
        ), x
    con.close()
