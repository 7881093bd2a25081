"""Guard-surface tests (P7 rejection rules, the reference's cypher_guard
suite analog)."""

from __future__ import annotations

import pytest

from knowledge_graph_system_spark.plans.guard import GuardError, guard_query


def test_appends_auto_limit():
    out = guard_query("SELECT * FROM nodes")
    assert out.endswith("LIMIT 1000")


def test_respects_existing_limit():
    out = guard_query("SELECT * FROM nodes LIMIT 5")
    assert out.count("LIMIT") == 1


@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE nodes",
        "INSERT INTO nodes VALUES (1)",
        "SELECT * FROM nodes; DROP TABLE nodes",
        "WITH x AS (SELECT 1) DELETE FROM nodes",
        "UPDATE nodes SET label = 'x'",
        "CREATE TABLE t AS SELECT 1",
        "SET spark.sql.ansi.enabled=false",
        "EXPLAIN SELECT 1",
    ],
)
def test_rejects_writes_and_nonselect(bad):
    with pytest.raises(GuardError):
        guard_query(bad)


def test_comments_cannot_hide_keywords():
    with pytest.raises(GuardError):
        guard_query("SELECT 1 /* harmless */ ; DROP TABLE nodes")
    # comment stripped, then valid
    out = guard_query("SELECT 1 -- DROP TABLE nodes")
    assert "DROP" not in out


def test_guarded_execution(spark, ctx):
    from knowledge_graph_system_spark.plans.guard import run_guarded
    from tests.conftest import SF_DIR

    rows = run_guarded(spark, SF_DIR, "SELECT count(*) AS n FROM edges").collect()
    assert rows[0]["n"] == ctx.edges.count()
    with pytest.raises(GuardError):
        run_guarded(spark, SF_DIR, "DROP TABLE edges")


def test_limit_offset_counts_as_bounded():
    out = guard_query("SELECT * FROM nodes LIMIT 5 OFFSET 10")
    assert out.count("LIMIT") == 1


def test_string_literals_do_not_trip_keyword_scan():
    out = guard_query("SELECT * FROM nodes WHERE name = 'insert; drop'")
    assert "LIMIT 1000" in out
    assert "'insert; drop'" in out  # literal preserved in executed text


def test_escaped_quote_in_literal():
    out = guard_query("SELECT * FROM nodes WHERE name = 'O''Brien; delete'")
    assert "'O''Brien; delete'" in out


def test_keywords_outside_literals_still_rejected():
    with pytest.raises(GuardError):
        guard_query("SELECT * FROM nodes WHERE name = 'x'; DROP TABLE nodes")
    with pytest.raises(GuardError):
        guard_query("SELECT 'ok' FROM nodes WHERE 1=1 AND 2=2 UNION ALL SELECT 'y'; DELETE FROM nodes")


def test_unterminated_literal_rejected():
    with pytest.raises(GuardError):
        guard_query("SELECT * FROM nodes WHERE name = 'oops")


def test_comment_markers_inside_literals_survive():
    # regression: a '--' or '/*' INSIDE a string literal is literal text,
    # not a comment — the old comment-regex-first order truncated these
    out = guard_query("SELECT * FROM nodes WHERE name = 'a--b'")
    assert "'a--b'" in out
    out = guard_query("SELECT * FROM nodes WHERE name = 'x/*y*/z'")
    assert "'x/*y*/z'" in out


def test_quotes_inside_comments_ignored():
    out = guard_query("SELECT 1 -- don't trip the literal scanner\n")
    assert out.startswith("SELECT 1")
    with pytest.raises(GuardError):
        guard_query("SELECT 'unterminated")


def test_escaped_quotes_in_literals():
    out = guard_query("SELECT * FROM nodes WHERE name = 'it''s -- fine'")
    assert "'it''s -- fine'" in out
