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
# a caller-bounded tail: LIMIT n [OFFSET m] — OFFSET alone doesn't bound
_BOUNDED = re.compile(r"\blimit\s+\d+(\s+offset\s+\d+)?\s*$", re.IGNORECASE)
DEFAULT_LIMIT = 1000


class GuardError(ValueError):
    pass


def scan_statement(
    sql: str, line_comments: tuple[str, ...] = ("--",)
) -> tuple[str, str]:
    """One left-to-right pass tracking quote/comment state.

    Returns (executable, scannable): comments become a single space in
    both; string-literal CONTENT is kept in `executable` but blanked to
    '' in `scannable`. Because the pass tracks state, comment markers
    inside literals stay literal text (WHERE name = 'a--b' survives) and
    quotes inside comments are ignored — the failure mode of running a
    comment regex before blanking literals. Raises GuardError on an
    unterminated literal. Shared by the SQL guard and the Cypher front
    end (which passes line_comments=('--', '//'))."""
    exec_out: list[str] = []
    scan_out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while True:
                if j >= n:
                    raise GuardError("unterminated string literal")
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            exec_out.append(sql[i : j + 1])
            scan_out.append("''")
            i = j + 1
        elif any(sql.startswith(m, i) for m in line_comments):
            nl = sql.find("\n", i)
            i = n if nl == -1 else nl  # the newline itself survives
            exec_out.append(" ")
            scan_out.append(" ")
        elif sql.startswith("/*", i):
            end = sql.find("*/", i + 2)
            i = n if end == -1 else end + 2
            exec_out.append(" ")
            scan_out.append(" ")
        else:
            exec_out.append(c)
            scan_out.append(c)
            i += 1
    return "".join(exec_out), "".join(scan_out)


def guard_query(sql: str, auto_limit: int | None = DEFAULT_LIMIT) -> str:
    """Validate a read-only single-statement SELECT; append a LIMIT when
    the caller didn't bound the result (the reference's auto-LIMIT)."""
    # keyword/semicolon scanning must not see string literal CONTENT:
    # WHERE name = 'insert; drop' is a legitimate read. The single-pass
    # scanner blanks literals for scanning; the executed text keeps them.
    executable, scannable = scan_statement(sql)
    stripped = executable.strip().rstrip(";")
    scannable = scannable.strip().rstrip(";")
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
