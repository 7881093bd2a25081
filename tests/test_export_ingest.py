"""Export/import round-trip, GEXF, ingestion dataflow, epoch freshness."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from knowledge_graph_system_spark.sources.export import export_graph, import_graph, to_gexf
from knowledge_graph_system_spark.sources.ingest import (
    ingest_documents,
    mock_extract_concepts,
    two_tier_upsert,
)
from knowledge_graph_system_spark.streaming.epochs import (
    DerivedTable,
    committed_epoch,
    snapshot,
    with_epoch,
)


def test_export_import_roundtrip(ctx, spark, tmp_path):
    out = str(tmp_path / "backup")
    manifest = export_graph(ctx.nodes, ctx.edges, ctx.vocab, out, epoch=7)
    nodes, edges, m2 = import_graph(spark, out)
    assert m2 == manifest and m2["epoch"] == 7
    assert nodes.count() == manifest["counts"]["nodes"] == ctx.nodes.count()
    assert edges.count() == manifest["counts"]["edges"]
    # column-level fidelity on a sample node
    orig = ctx.nodes.filter(F.col("node_id") == "C1").collect()[0]
    back = nodes.filter(F.col("node_id") == "C1").collect()[0]
    assert orig["name"] == back["name"] and orig["ontology"] == back["ontology"]


def test_import_id_remap(ctx, spark, tmp_path):
    out = str(tmp_path / "backup2")
    export_graph(ctx.nodes, ctx.edges, ctx.vocab, out)
    nodes, edges, _ = import_graph(spark, out, id_prefix="r2:")
    assert nodes.filter(~F.col("node_id").startswith("r2:")).count() == 0
    assert edges.filter(~F.col("src").startswith("r2:")).count() == 0
    # remap is consistent: every edge endpoint still resolves
    ids = nodes.select("node_id")
    dangling = edges.join(ids.withColumnRenamed("node_id", "src"), "src", "left_anti")
    assert dangling.count() == 0


def test_import_rejects_bad_version(ctx, spark, tmp_path):
    import json, os

    out = str(tmp_path / "backup3")
    export_graph(ctx.nodes.limit(5), ctx.edges.limit(5), ctx.vocab, out)
    with open(os.path.join(out, "manifest.json")) as fh:
        m = json.load(fh)
    m["format_version"] = 99
    with open(os.path.join(out, "manifest.json"), "w") as fh:
        json.dump(m, fh)
    with pytest.raises(ValueError, match="unsupported backup version"):
        import_graph(spark, out)


def test_gexf_bounded_and_wellformed(ctx):
    doc = to_gexf(ctx.nodes, ctx.edges, max_nodes=50)
    root = ET.fromstring(doc)  # raises on malformed XML
    ns = "{http://gexf.net/1.3}"
    nodes = root.findall(f".//{ns}node")
    edges = root.findall(f".//{ns}edge")
    assert 0 < len(nodes) <= 50
    ids = {n.get("id") for n in nodes}
    for e in edges:
        assert e.get("source") in ids and e.get("target") in ids


def test_gexf_quotes_in_attribute_values_stay_wellformed(spark):
    """A double quote in a name/rel_type must escape to &quot; — the
    values sit inside double-quoted XML attributes, where a raw quote
    is malformed (ADVICE r9). Pinned on BOTH surfaces: the bounded
    to_gexf document parses, and the distributed fragment rows parse
    individually with the original value round-tripping back out."""
    import xml.etree.ElementTree as ET2

    from knowledge_graph_system_spark.sources.export import (
        _EDGE_FRAG,
        _NODE_FRAG,
        to_gexf,
    )

    nodes = spark.createDataFrame(
        [("n1", 'say "hi"', "ont<&>1"), ("n2", "plain", 'o"2')],
        "node_id string, name string, ontology string",
    )
    edges = spark.createDataFrame(
        [("n1", "n2", 'rel "quoted" <type>')], "src string, dst string, rel_type string"
    )
    doc = to_gexf(nodes, edges, max_nodes=10)
    root = ET2.fromstring(doc)  # raises on malformed XML
    ns = "{http://gexf.net/1.3}"
    assert {n.get("label") for n in root.findall(f".//{ns}node")} == {
        'say "hi"', "plain",
    }
    assert [e.get("label") for e in root.findall(f".//{ns}edge")] == [
        'rel "quoted" <type>'
    ]
    # the distributed fragment projections share the same escape string
    nfrag = nodes.withColumn("ci", F.lit(0)).selectExpr(f"{_NODE_FRAG} AS f")
    efrag = edges.selectExpr(f"{_EDGE_FRAG} AS f")
    for r in nfrag.collect() + efrag.collect():
        # wrap to bind the viz: prefix a fragment uses but can't declare
        el = ET2.fromstring(f'<w xmlns:viz="v">{r["f"]}</w>')[0]
        assert '"' in (el.get("label") or "") or el.get("label") == "plain"


def test_ingest_extract_and_upsert(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot"),
            (2, "alpha bravo charlie delta echo foxtrot"),  # same content
            (3, "zulu yankee xray whiskey victor uniform"),
        ],
        "doc_id long, text string",
    )
    up = ingest_documents(docs)
    rows = up.collect()
    assert {r["action"] for r in rows} == {"insert"}  # empty existing set
    # re-ingest doc 3 against the concepts from doc 1+2 → all merge or insert deterministically
    from knowledge_graph_system_spark.functions.text import chunk_by_count
    from knowledge_graph_system_spark.sources.ingest import embed_concepts

    existing = embed_concepts(
        mock_extract_concepts(chunk_by_count(docs.filter(F.col("doc_id") == 1)))
    )
    up2 = two_tier_upsert(
        embed_concepts(mock_extract_concepts(chunk_by_count(docs.filter(F.col("doc_id") == 2)))),
        existing,
    )
    acts = {r["term"]: r["action"] for r in up2.collect()}
    # identical terms embed identically (sim=1.0) → every one merges
    assert set(acts.values()) == {"merge"}
    res = {r["term"]: r["resolved_id"] for r in up2.collect()}
    ex = {r["term"]: r["concept_id"] for r in existing.collect()}
    assert res == {t: ex[t] for t in res}


def test_epoch_snapshot_and_derived_staleness(spark):
    events = spark.createDataFrame(
        [(i, i * 1.0) for i in range(250)], "event_id long, value double"
    )
    stamped = with_epoch(events)  # bucket=100 → epochs 0,1,2
    committed = committed_epoch(events)
    assert committed == 1  # epoch 2 is in-flight
    snap = snapshot(stamped, committed)
    assert snap.agg(F.max("event_id")).collect()[0][0] == 199

    builds = []

    def build(epoch):
        builds.append(epoch)
        return snapshot(stamped, epoch).groupBy().agg(F.count("*").alias("n"))

    dt = DerivedTable(build=build)
    dt.refresh_if_stale(1)
    dt.refresh_if_stale(1)  # fresh → no rebuild
    dt.refresh_if_stale(2)  # watermark moved → rebuild
    assert builds == [1, 2]


def test_r10_candidate_gexf_fragments(spark):
    """Driver-style compare for the prepared s6_gexf_fragments row at
    BOTH gate scale factors: GEXF sanitize + per-ontology palette
    coloring as distributed (kind, fragment) rows over every node AND
    edge — both kinds must be non-empty (a first cut with to_gexf's
    first-1000 node bound induced ZERO edges: the empty==empty trap),
    and hash-exact against the shared-expression SQL oracle."""
    import duckdb

    from knowledge_graph_system_spark.sources.export import (
        s6_gexf_fragments,
        s6_gexf_fragments_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, s6_gexf_fragments(spark, sf).collect()))
        con = duckdb.connect()
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        want = sorted(
            map(tuple, con.execute(s6_gexf_fragments_oracle()).fetchall())
        )
        con.close()
        kinds = {k for k, _ in got}
        assert kinds == {"node", "edge"}
        assert got == want
