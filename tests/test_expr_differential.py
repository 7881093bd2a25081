"""Differential test: the Cypher expression parser vs DuckDB.

Generates seeded-random typed expression trees over the documents
table, renders each tree BOTH as Cypher expression text (compiled by
plans/expr.py into a Spark Column) and as the equivalent DuckDB SQL,
evaluates all trees in ONE Spark job and ONE DuckDB query, and
compares cell-for-cell. Exercises arithmetic precedence, parentheses,
chained AND/OR/NOT/XOR, comparisons, IN lists, string predicates, and
the scalar-function whitelist against an independent engine."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from knowledge_graph_system_spark.plans.expr import compile_expr
from knowledge_graph_system_spark.plans.guard import GuardError
from tests.conftest import SF_DIR

# (cypher name, sql name, type): columns of the documents table
_NUM_COLS = ["d.doc_id", "d.n_chars"]
_STR_COLS = ["d.lang", "d.source"]


class _Gen:
    def __init__(self, rng: random.Random):
        self.r = rng

    # every node returns (cypher_text, sql_text)
    def num(self, depth: int) -> tuple[str, str]:
        if depth <= 0 or self.r.random() < 0.3:
            if self.r.random() < 0.5:
                c = self.r.choice(_NUM_COLS)
                return c, c.split(".")[1]
            v = self.r.choice([0, 1, 2, 7, 100, -3, 2.5, 0.1])
            return str(v), str(v)
        kind = self.r.choice(["add", "sub", "mul", "div", "paren", "fn"])
        a_c, a_s = self.num(depth - 1)
        if kind == "paren":
            return f"({a_c})", f"({a_s})"
        if kind == "fn":
            fn = self.r.choice(["abs", "floor", "ceil"])
            return f"{fn}({a_c})", f"{fn}({a_s})"
        b_c, b_s = self.num(depth - 1)
        if kind == "div":
            # nonzero literal divisor: Spark ANSI mode errors on /0
            d = self.r.choice([2, 4, 7.0])
            return f"({a_c}) / {d}", f"({a_s}) / {d}"
        op = {"add": "+", "sub": "-", "mul": "*"}[kind]
        return f"{a_c} {op} {b_c}", f"{a_s} {op} {b_s}"

    def string(self) -> tuple[str, str]:
        if self.r.random() < 0.6:
            c = self.r.choice(_STR_COLS)
            col = c.split(".")[1]
            if self.r.random() < 0.4:
                fn = self.r.choice([("toUpper", "upper"), ("toLower", "lower")])
                return f"{fn[0]}({c})", f"{fn[1]}({col})"
            return c, col
        v = self.r.choice(["en", "fr", "web", "x"])
        return f"'{v}'", f"'{v}'"

    def listpred(self) -> tuple[str, str]:
        """any/all/none/single(w IN split(col, d) WHERE pred) — Cypher
        higher-order list predicates vs DuckDB list_filter counting."""
        col_c, col_s = self.r.choice([(c, c.split(".")[1]) for c in _STR_COLS])
        delim = self.r.choice(["r", "c", "0", "e"])
        fn = self.r.choice(["any", "all", "none", "single"])
        pred_c, pred_s = self.r.choice(
            [
                ("w = 'c0'", "w = 'c0'"),
                ("w <> ''", "w <> ''"),
                ("char_length(w) > 1", "length(w) > 1"),
                ("w CONTAINS '1'", "contains(w, '1')"),
            ]
        )
        lst_c = f"split({col_c}, '{delim}')"
        lst_s = f"string_split({col_s}, '{delim}')"
        cnt = f"len(list_filter({lst_s}, w -> {pred_s}))"
        sql = {
            "any": f"{cnt} > 0",
            "all": f"{cnt} = len({lst_s})",
            "none": f"{cnt} = 0",
            "single": f"{cnt} = 1",
        }[fn]
        return f"{fn}(w IN {lst_c} WHERE {pred_c})", f"({sql})"

    def listcomp(self) -> tuple[str, str]:
        """[w IN split(col, d) WHERE pred | expr] — comprehension vs
        DuckDB list_filter/list_transform (either part may be absent)."""
        col_c, col_s = self.r.choice([(c, c.split(".")[1]) for c in _STR_COLS])
        delim = self.r.choice(["r", "c", "0", "e"])
        lst_c, lst_s = f"split({col_c}, '{delim}')", f"string_split({col_s}, '{delim}')"
        pred_c, pred_s = self.r.choice(
            [("w <> ''", "w <> ''"), ("char_length(w) > 1", "length(w) > 1")]
        )
        proj_c, proj_s = self.r.choice(
            [("toUpper(w)", "upper(w)"), ("char_length(w)", "length(w)")]
        )
        form = self.r.choice(["where", "proj", "both"])
        if form == "where":
            return (
                f"[w IN {lst_c} WHERE {pred_c}]",
                f"list_filter({lst_s}, w -> {pred_s})",
            )
        if form == "proj":
            return (
                f"[w IN {lst_c} | {proj_c}]",
                f"list_transform({lst_s}, w -> {proj_s})",
            )
        return (
            f"[w IN {lst_c} WHERE {pred_c} | {proj_c}]",
            f"list_transform(list_filter({lst_s}, w -> {pred_s}), w -> {proj_s})",
        )

    def reduce_expr(self) -> tuple[str, str]:
        """reduce(acc = init, w IN split(col, d) | acc + f(w)) vs the
        DuckDB sum-over-transform equivalent."""
        col_c, col_s = self.r.choice([(c, c.split(".")[1]) for c in _STR_COLS])
        delim = self.r.choice(["r", "c", "0", "e"])
        init = self.r.choice([0, 7])
        body_c, body_s = self.r.choice(
            [
                ("char_length(w)", "length(w)"),
                ("char_length(w) * 2", "length(w) * 2"),
            ]
        )
        return (
            f"reduce(acc = {init}, w IN split({col_c}, '{delim}') | acc + {body_c})",
            f"({init} + coalesce(list_sum(list_transform("
            f"string_split({col_s}, '{delim}'), w -> {body_s})), 0))",
        )

    def cmp(self, depth: int) -> tuple[str, str]:
        kind = self.r.choice(
            ["numcmp", "strcmp", "strpred", "in_num", "in_str", "chain",
             "listpred"]
        )
        if kind == "listpred":
            return self.listpred()
        if kind == "numcmp":
            a_c, a_s = self.num(depth)
            b_c, b_s = self.num(depth)
            op = self.r.choice(["=", "<>", "<", "<=", ">", ">="])
            return f"{a_c} {op} {b_c}", f"{a_s} {op} {b_s}"
        if kind == "chain":
            m_c, m_s = self.r.choice(
                [(c, c.split(".")[1]) for c in _NUM_COLS]
            )
            lo, hi = sorted(self.r.sample([0, 50, 200, 1000], 2))
            return (
                f"{lo} < {m_c} < {hi}",
                f"({lo} < {m_s} AND {m_s} < {hi})",
            )
        if kind == "strcmp":
            a_c, a_s = self.string()
            b_c, b_s = self.string()
            op = self.r.choice(["=", "<>"])
            return f"{a_c} {op} {b_c}", f"{a_s} {op} {b_s}"
        if kind == "strpred":
            a_c, a_s = self.string()
            lit = self.r.choice(["e", "w", "fr", "b"])
            pred = self.r.choice(
                [
                    ("STARTS WITH", "starts_with({}, '{}')"),
                    ("ENDS WITH", "ends_with({}, '{}')"),
                    ("CONTAINS", "contains({}, '{}')"),
                ]
            )
            return (
                f"{a_c} {pred[0]} '{lit}'",
                pred[1].format(a_s, lit),
            )
        if kind == "in_num":
            c = self.r.choice(_NUM_COLS)
            vals = self.r.sample(range(0, 300), 3)
            lst = ", ".join(map(str, vals))
            return f"{c} IN [{lst}]", f"{c.split('.')[1]} IN ({lst})"
        c_c, c_s = self.r.choice([(c, c.split(".")[1]) for c in _STR_COLS])
        vals = self.r.sample(["en", "fr", "de", "web", "book", "x"], 2)
        qs = ", ".join(f"'{v}'" for v in vals)
        return f"{c_c} IN [{qs}]", f"{c_s} IN ({qs})"

    def boolean(self, depth: int) -> tuple[str, str]:
        if depth <= 0 or self.r.random() < 0.35:
            return self.cmp(1)
        kind = self.r.choice(["and", "or", "xor", "not", "paren"])
        a_c, a_s = self.boolean(depth - 1)
        if kind == "not":
            return f"NOT ({a_c})", f"NOT ({a_s})"
        if kind == "paren":
            return f"({a_c})", f"({a_s})"
        b_c, b_s = self.boolean(depth - 1)
        if kind == "xor":
            return f"({a_c}) XOR ({b_c})", f"(({a_s}) <> ({b_s}))"
        op = kind.upper()
        # parenthesize both renderings so the generated tree, not the
        # precedence rules, defines the structure (precedence itself is
        # pinned by tests/test_properties.py)
        return f"({a_c}) {op} ({b_c})", f"({a_s}) {op} ({b_s})"


class _DocScope:
    """Resolve d.col references against the raw documents frame."""

    def resolve(self, ref: str) -> str:
        if ref.startswith("d.") and (ref in _NUM_COLS or ref in _STR_COLS):
            return ref.split(".")[1]
        raise GuardError(f"unknown reference {ref!r}")


N_EXPRS = 120


def test_expression_parser_matches_duckdb(spark):
    rng = random.Random(20260814)
    gen = _Gen(rng)
    exprs = []
    while len(exprs) < N_EXPRS:
        depth = rng.choice([1, 2, 3])
        roll = rng.random()
        if roll < 0.6:
            exprs.append(gen.boolean(depth))
        elif roll < 0.8:
            exprs.append(gen.num(depth))
        elif roll < 0.9:
            exprs.append(gen.listcomp())
        else:
            exprs.append(gen.reduce_expr())

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scope = _DocScope()
    cols = [docs["doc_id"].alias("doc_id")]
    for i, (cy, _) in enumerate(exprs):
        col, has_agg = compile_expr(scope, cy, allow_agg=False)
        assert not has_agg
        cols.append(col.alias(f"e{i}"))
    spark_rows = {
        r["doc_id"]: r for r in docs.select(*cols).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    sql_items = ", ".join(
        f"({s}) AS e{i}" for i, (_, s) in enumerate(exprs)
    )
    duck_rows = {
        r[0]: r
        for r in con.execute(
            f"SELECT doc_id, {sql_items} FROM documents"
        ).fetchall()
    }
    con.close()

    assert set(spark_rows) == set(duck_rows)
    mismatches = []
    for doc_id, srow in spark_rows.items():
        drow = duck_rows[doc_id]
        for i in range(N_EXPRS):
            sv, dv = srow[f"e{i}"], drow[i + 1]
            if isinstance(sv, float) or isinstance(dv, float):
                same = (
                    (sv is None and dv is None)
                    or (
                        sv is not None
                        and dv is not None
                        and math.isclose(float(sv), float(dv), rel_tol=1e-9, abs_tol=1e-9)
                    )
                )
            else:
                same = sv == dv
            if not same:
                mismatches.append((doc_id, i, exprs[i][0], sv, dv))
    assert not mismatches, mismatches[:5]
