"""Guarded raw-query surface (SURVEY.md §2.2 P7).

Reference parity: the Cypher safety guard rejects write keywords and
unbounded variable-length paths before anything reaches the engine
(`/root/reference/api/app/services/cypher_guard.py:31-46`,
`program_validator.py:339-575` rules V010-V016/V030), and optionally
appends a LIMIT (`routes/queries.py:1706-1708`).

Here the raw surface is Spark SQL over the registered graph views
(nodes/edges/vocab) — Catalyst is the analyzer the reference never had.
The guard stays a pure-string pre-filter in front of it: reject
mutations/DDL, cap result size, keep the query single-statement.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..registry import Ctx

# write/DDL keywords (word-boundary, case-insensitive) — V010-V016 analog
_FORBIDDEN = re.compile(
    r"\b(insert|update|delete|merge|drop|create|alter|truncate|grant|revoke|set|refresh|cache|uncache|use|copy|call)\b",
    re.IGNORECASE,
)
_COMMENT = re.compile(r"(--[^\n]*|/\*.*?\*/)", re.DOTALL)
# single-quoted SQL literal, '' as the escaped quote
_STRING = re.compile(r"'(?:[^']|'')*'")
# a caller-bounded tail: LIMIT n [OFFSET m] — OFFSET alone doesn't bound
_BOUNDED = re.compile(r"\blimit\s+\d+(\s+offset\s+\d+)?\s*$", re.IGNORECASE)
DEFAULT_LIMIT = 1000


class GuardError(ValueError):
    pass


def guard_query(sql: str, auto_limit: int | None = DEFAULT_LIMIT) -> str:
    """Validate a read-only single-statement SELECT; append a LIMIT when
    the caller didn't bound the result (the reference's auto-LIMIT)."""
    stripped = _COMMENT.sub(" ", sql).strip().rstrip(";")
    # keyword/semicolon scanning must not see string literal CONTENT:
    # WHERE name = 'insert; drop' is a legitimate read. Blank literals out
    # for scanning; the executed text keeps them.
    scannable = _STRING.sub("''", stripped)
    if "'" in scannable.replace("''", ""):
        raise GuardError("unterminated string literal")
    if ";" in scannable:
        raise GuardError("multi-statement queries are not allowed")
    if not re.match(r"^\s*(select|with)\b", scannable, re.IGNORECASE):
        raise GuardError("only SELECT/WITH queries are allowed")
    hit = _FORBIDDEN.search(scannable)
    if hit:
        raise GuardError(f"forbidden keyword: {hit.group(0)!r}")
    if auto_limit is not None and not _BOUNDED.search(scannable):
        stripped = f"{stripped}\nLIMIT {auto_limit}"
    return stripped


def run_guarded(spark: SparkSession, sf_dir: str, sql: str, auto_limit: int | None = DEFAULT_LIMIT) -> DataFrame:
    """Execute a guarded query against the graph views (nodes/edges/vocab
    registered as temp views)."""
    ctx = Ctx.get(spark, sf_dir)
    ctx.nodes.createOrReplaceTempView("nodes")
    ctx.edges.createOrReplaceTempView("edges")
    ctx.vocab.drop("embedding").createOrReplaceTempView("vocab")
    return spark.sql(guard_query(sql, auto_limit))


# ---------------------------------------------------------------------------
# Registered guarded-query demo
# ---------------------------------------------------------------------------

from ..registry import query  # noqa: E402
from ..sources.graph_view import graph_ctes  # noqa: E402

_DEMO_SQL = """
SELECT label, ontology, count(*) AS n, round(sum(weight), 2) AS total_weight
FROM nodes
GROUP BY label, ontology
"""


@query(
    "p7_guarded_query",
    oracle=graph_ctes()
    + """
SELECT label, ontology, CAST(count(*) AS BIGINT) AS n,
       round(sum(weight), 2) AS total_weight
FROM nodes GROUP BY label, ontology
LIMIT 1000
""",
)
def p7_guarded_query(spark: SparkSession, sf_dir: str):
    """The raw surface end-to-end: a caller SQL string passes the guard
    (auto-LIMIT appended) and runs through Catalyst over the graph views.
    Rejection paths are covered in tests/test_guard.py."""
    return run_guarded(spark, sf_dir, _DEMO_SQL)
