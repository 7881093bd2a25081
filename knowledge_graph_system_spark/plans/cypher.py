"""Cypher-subset front end: guarded openCypher → DataFrame plans (P7+).

The reference's raw query surface is guarded openCypher
(`/root/reference/api/app/routes/queries.py:1661-1795` executes it via
`api/app/lib/age_client/base.py:105-222`); its guard rejects write
keywords (rules V010-V016, `api/app/services/program_validator.py:
341-400`) and unbounded variable-length paths (V030, `program_validator.
py:489-560`, max depth 10). This module reproduces that surface
Spark-first: the same rejection rules in front of a compiler that turns
a MATCH/WHERE/RETURN subset into joins over the cached node/edge
DataFrames — Catalyst then plans the joins (broadcast/shuffle, pushdown)
instead of a bespoke graph executor.

Supported subset:
  MATCH (a:Label {prop: lit})-[r:TYPE]->(b) ...   one pattern, n hops
         directions ->, <-, undirected -          (undirected = both)
         bounded var-length -[:T*1..3]->          (upper bound ≤ 10)
  WHERE a.prop <op> lit | a.prop <op> b.prop      AND-conjunction
  RETURN a.prop [AS x], count(*)/count|sum|avg|min|max(a.prop) [AS x]
         implicit Cypher grouping: non-aggregate items are the keys
  ORDER BY item [ASC|DESC], ...   LIMIT n

Everything else (OPTIONAL MATCH, WITH, UNION, UNWIND, CALL, writes) is
rejected with a GuardError naming the rule — fail closed, like the
reference.

Scale shape: node patterns filter the cached nodes frame (label/prop
pushdown before the join), each hop is an equi-join on node_id against
the cached edge frame, and bounded var-length expands to ≤10 chained
joins unioned per length — no driver-side iteration, no collect.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes
from .guard import GuardError, scan_statement

MAX_VAR_PATH = 10  # reference MAX_VARIABLE_PATH_LENGTH (V030)

_NODE_PROPS = ("node_id", "label", "name", "ontology", "weight")
_EDGE_PROPS = ("rel_type", "confidence")

# V010-V016 write keywords + clauses outside the subset
_WRITE_KW = re.compile(
    r"\b(create|set|delete|merge|remove|drop|detach)\b", re.IGNORECASE
)
_UNSUPPORTED = re.compile(
    r"\b(optional|union|unwind|call|foreach|load|with)\b", re.IGNORECASE
)
_VAR_PATH = re.compile(r"\[\s*[^\]]*\*\s*(\d+)?(?:\s*(\.\.)\s*(\d+)?)?\s*\]")

_SHAPE = re.compile(
    r"^\s*match\s+(?P<pattern>.+?)"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"\s+return\s+(?P<ret>.+?)"
    r"(?:\s+order\s+by\s+(?P<order>.+?))?"
    r"(?:\s+limit\s+(?P<limit>\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_NODE_PAT = re.compile(
    r"\(\s*(?P<var>\w+)?\s*(?::\s*(?P<label>\w+))?\s*(?P<props>\{[^}]*\})?\s*\)"
)
_EDGE_PAT = re.compile(
    r"(?P<left><)?-\s*(?:\[\s*(?P<var>\w+)?\s*(?::\s*(?P<type>\w+))?\s*"
    r"(?P<star>\*\s*(?P<lo>\d+)?\s*(?:\.\.\s*(?P<hi>\d+)?)?)?\s*\])?\s*-(?P<right>>)?"
)

_LITERAL = re.compile(r"'(?:[^']|'')*'|-?\d+(?:\.\d+)?|true|false", re.IGNORECASE)
_CMP_OPS = ("<>", "<=", ">=", "=", "<", ">")
_AGGS = {"count": F.count, "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}


@dataclass
class _NodePat:
    var: str
    label: str | None
    props: dict[str, object]


@dataclass
class _EdgePat:
    var: str | None
    rel_type: str | None
    direction: str  # out | in | both
    lo: int = 1
    hi: int = 1


@dataclass
class _Item:
    expr: "F.Column"
    alias: str
    is_agg: bool


def check_cypher_safety(cypher: str) -> tuple[str, str]:
    """The reference guard's rejection rules on the literal-blanked text.
    Returns (executable, scannable) on success."""
    executable, scannable = scan_statement(cypher, line_comments=("--", "//"))
    if ";" in scannable:
        raise GuardError("multi-statement queries are not allowed")
    hit = _WRITE_KW.search(scannable)
    if hit:
        raise GuardError(f"write keyword (V010-V016): {hit.group(0)!r}")
    for m in _VAR_PATH.finditer(scannable):
        lo, dots, hi = m.group(1), m.group(2), m.group(3)
        if dots is None and lo is None:
            raise GuardError(f"unbounded variable-length path (V030): {m.group(0)!r}")
        if dots is not None and hi is None:
            raise GuardError(
                f"variable-length path without upper bound (V030): {m.group(0)!r}"
            )
        depth = int(hi if hi is not None else lo)
        if depth > MAX_VAR_PATH:
            raise GuardError(
                f"variable-length path depth {depth} exceeds maximum {MAX_VAR_PATH} (V030)"
            )
    hit = _UNSUPPORTED.search(scannable)
    if hit:
        raise GuardError(f"unsupported clause: {hit.group(0)!r}")
    return executable, scannable


# ---------------------------------------------------------------------------
# parsing helpers
# ---------------------------------------------------------------------------

def _literal_spans(s: str) -> list[tuple[int, int]]:
    spans, i, n = [], 0, len(s)
    while i < n:
        if s[i] == "'":
            j = i + 1
            while j < n:
                if s[j] == "'" and not (j + 1 < n and s[j + 1] == "'"):
                    break
                j += 2 if s[j] == "'" else 1
            spans.append((i, j + 1))
            i = j + 1
        else:
            i += 1
    return spans


def _split_outside_literals(s: str, sep: re.Pattern) -> list[str]:
    """Split on `sep` matches that fall outside single-quoted literals."""
    spans = _literal_spans(s)
    cuts = [
        m for m in sep.finditer(s)
        if not any(a <= m.start() < b for a, b in spans)
    ]
    out, pos = [], 0
    for m in cuts:
        out.append(s[pos : m.start()])
        pos = m.end()
    out.append(s[pos:])
    return [p.strip() for p in out if p.strip()]


def _parse_literal(tok: str):
    tok = tok.strip()
    if tok.startswith("'"):
        if not tok.endswith("'") or len(tok) < 2:
            raise GuardError(f"bad string literal {tok!r}")
        return tok[1:-1].replace("''", "'")
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        raise GuardError(f"unparseable literal {tok!r}") from None


def _parse_props(body: str) -> dict[str, object]:
    """{k: lit, ...} map inside a node pattern."""
    inner = body.strip()[1:-1].strip()
    if not inner:
        return {}
    out: dict[str, object] = {}
    for part in _split_outside_literals(inner, re.compile(r",")):
        k, _, v = part.partition(":")
        if not _:
            raise GuardError(f"bad property map entry {part!r}")
        out[k.strip()] = _parse_literal(v)
    return out


def _parse_pattern(text: str) -> tuple[list[_NodePat], list[_EdgePat]]:
    nodes: list[_NodePat] = []
    edges: list[_EdgePat] = []
    pos, anon = 0, 0
    m = _NODE_PAT.match(text.strip())
    if not m:
        raise GuardError(f"expected a node pattern at {text.strip()[:40]!r}")

    def mk_node(nm: re.Match) -> _NodePat:
        nonlocal anon
        var = nm.group("var")
        if var is None:
            var, anon = f"_anon{anon}", anon + 1
        props = _parse_props(nm.group("props")) if nm.group("props") else {}
        for k in props:
            if k not in _NODE_PROPS:
                raise GuardError(f"unknown node property {k!r}")
        return _NodePat(var, nm.group("label"), props)

    text = text.strip()
    nodes.append(mk_node(m))
    pos = m.end()
    while pos < len(text):
        em = _EDGE_PAT.match(text, pos)
        if not em:
            raise GuardError(f"expected an edge pattern at {text[pos:pos+40]!r}")
        left, right = em.group("left"), em.group("right")
        direction = "both" if not left and not right else ("in" if left else "out")
        if left and right:
            raise GuardError("edge cannot point both ways")
        lo = hi = 1
        if em.group("star"):
            if em.group("var"):
                raise GuardError("variable-length relationships cannot bind a variable")
            lo = int(em.group("lo") or 1)
            hi = int(em.group("hi") or em.group("lo") or 1)
        edges.append(_EdgePat(em.group("var"), em.group("type"), direction, lo, hi))
        pos = em.end()
        nm = _NODE_PAT.match(text, pos)
        if not nm:
            raise GuardError(f"expected a node pattern at {text[pos:pos+40]!r}")
        nodes.append(mk_node(nm))
        pos = nm.end()
    return nodes, edges


# ---------------------------------------------------------------------------
# compilation
# ---------------------------------------------------------------------------

@dataclass
class _Scope:
    """var → (kind, column prefix) for reference resolution."""
    cols: dict[str, str] = field(default_factory=dict)  # "var.prop" -> column

    def resolve(self, ref: str) -> str:
        ref = ref.strip()
        if ref not in self.cols:
            raise GuardError(f"unknown reference {ref!r}")
        return self.cols[ref]


def _node_frame(ctx: Ctx, pat: _NodePat) -> DataFrame:
    df = ctx.nodes
    if pat.label:
        df = df.filter(F.col("label") == pat.label)
    for k, v in pat.props.items():
        df = df.filter(F.col(k) == F.lit(v))
    return df.select([F.col(c).alias(f"{pat.var}__{c}") for c in _NODE_PROPS])


def _oriented_edges(ctx: Ctx, pat: _EdgePat) -> DataFrame:
    e = ctx.edges
    if pat.rel_type:
        e = e.filter(F.col("rel_type") == pat.rel_type)
    out = e.select(
        F.col("src").alias("__from"), F.col("dst").alias("__to"),
        "rel_type", "confidence",
    )
    if pat.direction == "out":
        return out
    rev = e.select(
        F.col("dst").alias("__from"), F.col("src").alias("__to"),
        "rel_type", "confidence",
    )
    return rev if pat.direction == "in" else out.unionByName(rev)


def _hop_pairs(edf: DataFrame, length: int) -> DataFrame:
    """(__from, __to) pairs for exactly `length` chained hops, one row
    per path (Cypher path multiplicity, not reachability)."""
    cur = edf.select("__from", "__to")
    for _ in range(length - 1):
        step = edf.select(
            F.col("__from").alias("__jfrom"), F.col("__to").alias("__jto")
        )
        cur = (
            cur.join(step, cur["__to"] == step["__jfrom"])
            .select(cur["__from"], F.col("__jto").alias("__to"))
        )
    return cur


def compile_cypher(ctx: Ctx, cypher: str) -> DataFrame:
    """Guard + parse + compile one Cypher statement to a DataFrame."""
    executable, _ = check_cypher_safety(cypher)
    shape = _SHAPE.match(executable)
    if not shape:
        raise GuardError("query must be MATCH ... [WHERE ...] RETURN ... "
                         "[ORDER BY ...] [LIMIT n]")
    nodes, edges = _parse_pattern(shape.group("pattern"))

    seen: set[str] = set()
    scope = _Scope()
    for np_ in nodes:
        if np_.var in seen:
            raise GuardError(f"duplicate variable {np_.var!r} (re-binding unsupported)")
        seen.add(np_.var)
        for c in _NODE_PROPS:
            scope.cols[f"{np_.var}.{c}"] = f"{np_.var}__{c}"

    df = _node_frame(ctx, nodes[0])
    for i, ep in enumerate(edges):
        lhs, rhs = nodes[i], nodes[i + 1]
        edf = _oriented_edges(ctx, ep)
        if (ep.lo, ep.hi) == (1, 1):
            sel = ["__from", "__to"]
            if ep.var:
                if ep.var in seen:
                    raise GuardError(f"duplicate variable {ep.var!r}")
                seen.add(ep.var)
                for c in _EDGE_PROPS:
                    scope.cols[f"{ep.var}.{c}"] = f"{ep.var}__{c}"
                edf = edf.select(
                    "__from", "__to",
                    *[F.col(c).alias(f"{ep.var}__{c}") for c in _EDGE_PROPS],
                )
            else:
                edf = edf.select(*sel)
        else:
            edf = reduce(
                DataFrame.unionByName,
                [_hop_pairs(edf, n) for n in range(ep.lo, ep.hi + 1)],
            )
        df = (
            df.join(edf, df[f"{lhs.var}__node_id"] == edf["__from"])
            .drop("__from")
            .join(
                _node_frame(ctx, rhs),
                F.col("__to") == F.col(f"{rhs.var}__node_id"),
            )
            .drop("__to")
        )

    if shape.group("where"):
        for cond in _split_outside_literals(
            shape.group("where"), re.compile(r"\band\b", re.IGNORECASE)
        ):
            df = df.filter(_compile_cond(scope, cond))

    items = [
        _compile_item(scope, part)
        for part in _split_outside_literals(shape.group("ret"), re.compile(r","))
    ]
    has_agg = any(it.is_agg for it in items)
    if has_agg:
        keys = [it.expr.alias(it.alias) for it in items if not it.is_agg]
        aggs = [it.expr.alias(it.alias) for it in items if it.is_agg]
        df = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)

    by = []
    if shape.group("order"):
        aliases = {it.alias: it for it in items}
        for part in _split_outside_literals(shape.group("order"), re.compile(r",")):
            m = re.match(r"^(.*?)(?:\s+(asc|desc))?$", part.strip(), re.IGNORECASE)
            ref = m.group(1).strip()
            if ref in aliases:
                col = F.col(ref) if has_agg else aliases[ref].expr
            elif has_agg:
                raise GuardError(
                    f"ORDER BY {ref!r} must be a returned alias when aggregating"
                )
            else:
                # ordering by a non-returned property: sort BEFORE the
                # projection drops it (Cypher allows this)
                col = F.col(scope.resolve(ref))
            by.append(col.desc() if (m.group(2) or "").lower() == "desc" else col.asc())
    if by:
        df = df.orderBy(*by)
    if shape.group("limit"):
        df = df.limit(int(shape.group("limit")))
    if not has_agg:
        df = df.select(*[it.expr.alias(it.alias) for it in items])
    return df


def _compile_cond(scope: _Scope, cond: str):
    for op in _CMP_OPS:
        # careful: '<=' before '<' (ordered in _CMP_OPS)
        idx = _find_op_outside_literals(cond, op)
        if idx >= 0:
            lhs = F.col(scope.resolve(cond[:idx]))
            rtxt = cond[idx + len(op):].strip()
            rhs = (
                F.col(scope.resolve(rtxt))
                if re.fullmatch(r"[A-Za-z_]\w*\.[A-Za-z_]\w*", rtxt)
                else F.lit(_parse_literal(rtxt))
            )
            return {
                "=": lhs == rhs, "<>": lhs != rhs, "<": lhs < rhs,
                "<=": lhs <= rhs, ">": lhs > rhs, ">=": lhs >= rhs,
            }[op]
    raise GuardError(f"unsupported condition {cond!r}")


def _find_op_outside_literals(s: str, op: str) -> int:
    spans = _literal_spans(s)
    i = s.find(op)
    while i >= 0:
        if not any(a <= i < b for a, b in spans):
            # don't mis-split '<>' / '<=' / '>=' at their middle char
            if op in ("<", ">") and i + 1 < len(s) and s[i + 1] in "=>":
                i = s.find(op, i + 2)
                continue
            return i
        i = s.find(op, i + 1)
    return -1


def _compile_item(scope: _Scope, part: str) -> _Item:
    m = re.match(r"^(?P<body>.+?)(?:\s+as\s+(?P<alias>\w+))?$", part.strip(),
                 re.IGNORECASE | re.DOTALL)
    body, alias = m.group("body").strip(), m.group("alias")
    am = re.match(r"^(?P<fn>\w+)\s*\(\s*(?P<arg>\*|[A-Za-z_]\w*\.[A-Za-z_]\w*)\s*\)$", body)
    if am and am.group("fn").lower() in _AGGS:
        fn = am.group("fn").lower()
        arg = am.group("arg")
        col = F.lit(1) if arg == "*" else F.col(scope.resolve(arg))
        expr = F.count(col) if fn == "count" else _AGGS[fn](col)
        return _Item(expr, alias or f"{fn}_{'all' if arg == '*' else arg.replace('.', '_')}", True)
    if re.fullmatch(r"[A-Za-z_]\w*\.[A-Za-z_]\w*", body):
        return _Item(F.col(scope.resolve(body)), alias or body.replace(".", "_"), False)
    raise GuardError(f"unsupported RETURN item {part!r}")


def run_cypher(spark: SparkSession, sf_dir: str, cypher: str) -> DataFrame:
    return compile_cypher(Ctx.get(spark, sf_dir), cypher)


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

_DEMO_CYPHER = """
MATCH (c:Customer)-[:PLACED]->(o:Order)-[:L0]->(p:Part)
WHERE c.weight > 9500 AND p.ontology <> 'Brand#45'
RETURN c.ontology AS segment, p.ontology AS brand, count(*) AS n
"""

_VARLEN_CYPHER = """
MATCH (c {node_id: 'C1'})-[*1..2]->(x)
RETURN x.label AS label, count(*) AS paths
"""


@query(
    "p7_cypher_subset",
    oracle=graph_ctes()
    + """
SELECT c.ontology AS segment, p.ontology AS brand, CAST(count(*) AS BIGINT) AS n
FROM nodes c
JOIN edges r1 ON r1.src = c.node_id AND r1.rel_type = 'PLACED'
JOIN nodes o ON o.node_id = r1.dst AND o.label = 'Order'
JOIN edges r2 ON r2.src = o.node_id AND r2.rel_type = 'L0'
JOIN nodes p ON p.node_id = r2.dst AND p.label = 'Part'
WHERE c.label = 'Customer' AND c.weight > 9500 AND p.ontology <> 'Brand#45'
GROUP BY c.ontology, p.ontology
""",
)
def p7_cypher_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop guarded Cypher through the compiler; the oracle is the
    equivalent relational join chain."""
    return run_cypher(spark, sf_dir, _DEMO_CYPHER)


@query(
    "p7_cypher_varlen",
    oracle=graph_ctes()
    + """,
step1 AS (SELECT dst FROM edges WHERE src = 'C1'),
step2 AS (SELECT e2.dst FROM step1 JOIN edges e2 ON e2.src = step1.dst),
allx AS (SELECT dst FROM step1 UNION ALL SELECT dst FROM step2)
SELECT n.label AS label, CAST(count(*) AS BIGINT) AS paths
FROM allx JOIN nodes n ON n.node_id = allx.dst GROUP BY n.label
""",
)
def p7_cypher_varlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded variable-length Cypher ([*1..2]): path multiplicity, not
    reachability — each distinct edge path counts once, matching the
    UNION ALL oracle."""
    return run_cypher(spark, sf_dir, _VARLEN_CYPHER)
