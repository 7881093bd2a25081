"""Distributed connected components: fixpoint semantics + O(log n)
convergence (chains), against hand-computed expectations."""

from __future__ import annotations

import pytest

from knowledge_graph_system_spark.operators.components import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r["node"], r["comp"])
        for r in connected_components(df, **kw).collect()
    }


def test_two_components_and_isolated_pair(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_long_chain_converges_log_rounds(spark):
    # a 40-node path needs ~40 rounds with plain propagation; pointer
    # jumping must finish well inside max_iter=10
    edges = [(i, i + 1) for i in range(40)]
    got = _cc(spark, edges, max_iter=10)
    assert got == {(i, 0) for i in range(41)}


def test_star_and_cycle(spark):
    star = [(100, x) for x in (101, 102, 103)]
    cycle = [(7, 8), (8, 9), (9, 7)]
    got = _cc(spark, star + cycle)
    assert {(n, 100) for n in (100, 101, 102, 103)} <= got
    assert {(n, 7) for n in (7, 8, 9)} <= got


def test_direction_irrelevant(spark):
    assert _cc(spark, [(5, 1), (1, 9)]) == _cc(spark, [(1, 5), (9, 1)])


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=1)


def test_dedup_apply_materializes_canonical_corpus(spark):
    """End-to-end apply: documents minus non-keepers, checked against
    the d_dup_groups recursive-SQL oracle wrapped in an anti-join."""
    import duckdb

    from knowledge_graph_system_spark.operators.components import (
        d_dup_groups,
        dedup_apply,
    )
    from knowledge_graph_system_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    groups = d_dup_groups(spark, SF_DIR)
    kept = dedup_apply(docs, groups)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(
        r[0]
        for r in con.sql(
            "SELECT doc_id FROM documents WHERE doc_id NOT IN ("
            f"SELECT doc_id FROM ({QUERIES['d_dup_groups'].oracle}) WHERE NOT keeper)"
        ).fetchall()
    )
    got = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert got == want
    # structural invariants: one keeper per group survives; total =
    # corpus - non-keepers; every kept grouped doc IS its group keeper
    n_docs = docs.count()
    n_losers = groups.filter("NOT keeper").count()
    assert len(got) == n_docs - n_losers and n_losers > 0
    surviving_grouped = groups.join(
        kept.select("doc_id"), "doc_id", "left_semi"
    )
    assert surviving_grouped.filter("NOT keeper").count() == 0
    assert (
        surviving_grouped.count()
        == groups.select("group_id").distinct().count()
    )
    con.close()


def test_embedding_dup_groups(spark):
    """Embedding-space groups: every pair's two ends share a group,
    group_id = min member, exactly one keeper per group."""
    from knowledge_graph_system_spark.operators.components import (
        embedding_dup_groups,
    )
    from knowledge_graph_system_spark.operators.dedup import d_embedding_neardup
    from tests.conftest import SF_DIR

    groups = embedding_dup_groups(spark, SF_DIR)
    g = {r["vec_id"]: (r["group_id"], r["keeper"]) for r in groups.collect()}
    pairs = [
        (r["vec_a"], r["vec_b"]) for r in d_embedding_neardup(spark, SF_DIR).collect()
    ]
    assert len(pairs) > 0
    for a, b in pairs:
        assert g[a][0] == g[b][0]
    by_group: dict[int, list[int]] = {}
    for v, (gid, keeper) in g.items():
        by_group.setdefault(gid, []).append((v, keeper))
    for gid, members in by_group.items():
        assert gid == min(v for v, _ in members)
        assert sum(1 for v, k in members if k) == 1
        assert all(k == (v == gid) for v, k in members)


# ---------------------------------------------------------------------------
# r9 candidates (driver-style compares) + r8 refactor byte-identity pins
# ---------------------------------------------------------------------------


def test_registered_oracles_unchanged_by_cte_extraction():
    """The r8 extraction of _GROUPS_CTES / _EMB_PAIR_CTES must leave
    the two registered tail rows' oracle strings byte-identical to
    their r7 values (the recording-window rule keys on code-or-oracle
    change; these hashes are the r7 artifacts' inputs)."""
    import hashlib

    from knowledge_graph_system_spark.registry import load_all

    q = load_all()
    assert (
        hashlib.sha256(q["d_dup_groups"].oracle.encode()).hexdigest()
        == "5ab9f15bf95086aa5294838f01b7e675c3b671f448f6e8a788d4e54358eb9978"
    )
    assert (
        hashlib.sha256(q["d_embedding_neardup"].oracle.encode()).hexdigest()
        == "78d3983521b7667c649eaaae6dae3a952de495ca505ab0704c699bc29fa1ba12"
    )


def _duck_docs_embeddings():
    import duckdb

    from tests.conftest import SF_DIR

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_r9_candidate_dedup_apply(spark):
    """Driver-style compare for the prepared d_dedup_apply row."""
    from knowledge_graph_system_spark.operators.components import (
        d_dedup_apply,
        d_dedup_apply_oracle,
    )
    from tests.conftest import SF_DIR

    got = sorted(map(tuple, d_dedup_apply(spark, SF_DIR).collect()))
    con = _duck_docs_embeddings()
    want = sorted(map(tuple, con.execute(d_dedup_apply_oracle()).fetchall()))
    con.close()
    assert len(got) > 0 and got == want


def test_r9_candidate_embedding_groups(spark):
    """Driver-style compare for the prepared d_embedding_groups row."""
    from knowledge_graph_system_spark.operators.components import (
        d_embedding_groups,
        d_embedding_groups_oracle,
    )
    from tests.conftest import SF_DIR

    got = sorted(map(tuple, d_embedding_groups(spark, SF_DIR).collect()))
    con = _duck_docs_embeddings()
    want = sorted(map(tuple, con.execute(d_embedding_groups_oracle()).fetchall()))
    con.close()
    assert len(got) > 0 and got == want


def test_resolve_keepers_by_quality(spark):
    """Quality-based keeper election over d_dup_groups-shaped input:
    the argmax-quality member of each group wins (ties by id), every
    group elects exactly one keeper, the DuckDB twin agrees
    row-for-row, and the result feeds dedup_apply unchanged."""
    import duckdb

    from knowledge_graph_system_spark.operators.components import (
        d_dup_groups,
        dedup_apply,
        resolve_keepers_by_quality,
    )
    from knowledge_graph_system_spark.registry import Ctx
    from tests.conftest import SF_DIR

    ctx = Ctx.get(spark, SF_DIR)
    docs = ctx.tables["documents"].select("doc_id", "n_chars")
    groups = d_dup_groups(spark, SF_DIR).localCheckpoint(eager=True)
    assert groups.count() > 0

    by_q = resolve_keepers_by_quality(groups, docs, "n_chars")
    rows = by_q.collect()
    # one keeper per group
    from collections import Counter

    per_group = Counter(r["group_id"] for r in rows if r["keeper"])
    all_groups = {r["group_id"] for r in rows}
    assert per_group.keys() == all_groups
    assert all(v == 1 for v in per_group.values())

    # DuckDB twin over the materialized group table
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.execute(
        "CREATE TABLE g (doc_id BIGINT, group_id BIGINT)"
    )
    con.executemany(
        "INSERT INTO g VALUES (?, ?)",
        [(r["doc_id"], r["group_id"]) for r in groups.collect()],
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                """
SELECT g.doc_id, g.group_id,
       row_number() OVER (
         PARTITION BY g.group_id ORDER BY d.n_chars DESC, g.doc_id) = 1 AS keeper
FROM g JOIN documents d USING (doc_id)
"""
            ).fetchall(),
        )
    )
    assert sorted(map(tuple, rows)) == want

    # composes with dedup_apply: keepers survive, losers are gone
    canon = dedup_apply(ctx.tables["documents"], by_q)
    ids = {r["doc_id"] for r in canon.select("doc_id").collect()}
    for r in rows:
        assert (r["doc_id"] in ids) == bool(r["keeper"])


def test_r11_candidate_keeper_election(spark):
    """Driver-style compare for the prepared d_keeper_election row at
    BOTH gate scale factors: find→group→elect-by-quality graded
    hash-exact against the byte-shared recursive-CC CTEs + the same
    argmax window (VERDICT r9 next #5 — the registration path for
    resolve_keepers_by_quality). Also pins that the election is not
    vacuous: at least one group's quality keeper differs from the
    min-id keeper at the gate sf."""
    import duckdb

    from knowledge_graph_system_spark.operators.components import (
        d_dup_groups,
        d_keeper_election,
        d_keeper_election_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got_rows = d_keeper_election(spark, sf).collect()
        got = sorted(map(tuple, got_rows))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(
            map(tuple, con.execute(d_keeper_election_oracle()).fetchall())
        )
        con.close()
        assert len(got) > 0 and got == want
        if sf.endswith("0.01"):
            min_id = {
                (r["doc_id"], r["keeper"])
                for r in d_dup_groups(spark, sf).collect()
            }
            assert any(
                (r["doc_id"], r["keeper"]) not in min_id for r in got_rows
            ), "quality election never differed from min-id at the gate sf"
