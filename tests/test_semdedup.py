"""SemDeDup semantic dedup (operators/semdedup.py) — prepared r12
registry candidate: driver-style oracle compares at both gate scale
factors plus the paper's exemplar-election semantics."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def _oracle_rows(sql: str, sf: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_r12_candidate_d_semdedup(spark):
    """Driver-style compare for the prepared d_semdedup row at BOTH
    gate scale factors: cluster → within-cluster pairs → CC groups →
    argmin-centroid-cosine election, hash-exact against the recursive
    DuckDB twin, and provably non-empty."""
    from knowledge_graph_system_spark.operators.semdedup import (
        d_semdedup,
        d_semdedup_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, d_semdedup(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(d_semdedup_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_semdedup_election_semantics(spark):
    """Exactly one keeper per group; every group has >= 2 members; the
    keeper is the member with the LOWEST cosine to its cluster centroid
    (ties by vec_id) — the SemDeDup exemplar rule."""
    from knowledge_graph_system_spark.operators.semdedup import (
        cluster_assign,
        d_semdedup,
    )
    from knowledge_graph_system_spark.registry import Ctx

    sf = "/root/testdata/sf0.001"
    groups = d_semdedup(spark, sf).collect()
    by_group: dict[int, list] = {}
    for r in groups:
        by_group.setdefault(r["group_id"], []).append(r)
    assert by_group
    for members in by_group.values():
        assert len(members) >= 2
        assert sum(1 for m in members if m["keeper"]) == 1

    ctx = Ctx.get(spark, sf)
    vecs = ctx.tables["embeddings"].select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    ccos = {r["vec_id"]: r["ccos"] for r in cluster_assign(vecs).collect()}
    for members in by_group.values():
        elected = [m for m in members if m["keeper"]][0]
        best = min(members, key=lambda m: (ccos[m["vec_id"]], m["vec_id"]))
        assert elected["vec_id"] == best["vec_id"]


def test_semdedup_groups_are_within_cluster(spark):
    """Single-assignment contract: every duplicate group lives inside
    one cluster (the paper's trade — cross-cluster pairs are out of
    contract by construction)."""
    from knowledge_graph_system_spark.operators.semdedup import d_semdedup

    rows = d_semdedup(spark, "/root/testdata/sf0.001").collect()
    labels_per_group: dict[int, set] = {}
    for r in rows:
        labels_per_group.setdefault(r["group_id"], set()).add(r["clabel"])
    assert all(len(s) == 1 for s in labels_per_group.values())
