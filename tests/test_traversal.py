"""Traversal invariants from FIXTURES.md's cheatsheet (the rules the
reference itself enforces, `graph-accel/docs/DESIGN.md:279-283`,
`benchmark-findings.md:171-208`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.traversal import (
    bfs,
    degrees,
    directed_edges,
    enumerate_paths,
    shortest_path_length,
    subgraph,
)

START = "C1"


def test_depth1_equals_single_join(ctx):
    via_bfs = {
        r["node_id"]
        for r in bfs(ctx.edges, [START], 1).filter(F.col("dist") == 1).collect()
    }
    via_join = {
        r["dst"] for r in ctx.edges.filter(F.col("src") == START).select("dst").collect()
    }
    assert via_bfs == via_join


def test_out_union_in_equals_both(ctx):
    out_n = {r["node_id"] for r in bfs(ctx.edges, [START], 2, "out").collect()}
    in_n = {r["node_id"] for r in bfs(ctx.edges, [START], 2, "in").collect()}
    both = {r["node_id"] for r in bfs(ctx.edges, [START], 2, "both").collect()}
    # both-direction BFS can reach more (mixed-direction paths), never less
    assert (out_n | in_n) <= both


def test_confidence_filter_monotonic(ctx):
    lo = {r["node_id"] for r in bfs(ctx.edges, [START], 2, min_confidence=0.3).collect()}
    hi = {r["node_id"] for r in bfs(ctx.edges, [START], 2, min_confidence=0.9).collect()}
    assert hi <= lo


def test_null_confidence_passes(ctx):
    kept = directed_edges(ctx.edges, "out", min_confidence=0.99)
    assert kept.filter(F.col("src").isNull()).count() == 0
    nulls_before = ctx.edges.filter(F.col("confidence").isNull()).count()
    nulls_after = (
        ctx.edges.filter((F.col("confidence") >= 0.99) | F.col("confidence").isNull())
        .filter(F.col("confidence").isNull())
        .count()
    )
    assert nulls_before == nulls_after > 0


def test_shortest_path_matches_bfs_dist(ctx):
    sp = shortest_path_length(ctx.edges, START, "S1", max_hops=6).collect()
    via_bfs = (
        bfs(ctx.edges, [START], 6).filter(F.col("node_id") == "S1").collect()
    )
    assert sp and via_bfs and sp[0]["dist"] == via_bfs[0]["dist"]


def test_k_shortest_sorted_and_simple(ctx):
    paths = enumerate_paths(ctx.edges, START, "S1", max_hops=4, k=5).collect()
    assert paths
    hops = [p["hops"] for p in paths]
    assert hops == sorted(hops)
    for p in paths:
        seq = p["path"].split(">")
        assert len(seq) == len(set(seq)), "path must be simple (no repeated node)"
        assert seq[0] == START and seq[-1] == "S1"


def test_subgraph_endpoints_inside_node_set(ctx, spark):
    nset = bfs(ctx.edges, [START], 2)
    sub = subgraph(ctx.edges, nset)
    ids = {r["node_id"] for r in nset.collect()}
    for e in sub.collect():
        assert e["src"] in ids and e["dst"] in ids


def test_degrees_sum_to_edge_count(ctx):
    d = degrees(ctx.edges)
    total = d.agg(F.sum("out_degree").alias("o"), F.sum("in_degree").alias("i")).collect()[0]
    n_edges = ctx.edges.count()
    assert total["o"] == n_edges == total["i"]


def test_shortest_path_reconstruction(ctx):
    from knowledge_graph_system_spark.operators.traversal import shortest_path

    path = shortest_path(ctx.edges, START, "S1", max_hops=6)
    assert path and path[0] == START and path[-1] == "S1"
    # every consecutive pair must be a real edge
    edge_set = {(r["src"], r["dst"]) for r in ctx.edges.select("src", "dst").collect()}
    for a, b in zip(path, path[1:]):
        assert (a, b) in edge_set
    # length consistent with the BFS distance
    dist = shortest_path_length(ctx.edges, START, "S1", max_hops=6).collect()[0]["dist"]
    assert len(path) == dist + 1
    # unreachable / nonexistent target → empty
    assert shortest_path(ctx.edges, START, "ZZ-missing", max_hops=3) == []


def test_yen_matches_bounded_enumeration(ctx):
    from knowledge_graph_system_spark.operators.traversal import yen_k_shortest

    yen = yen_k_shortest(ctx.edges, START, "S1", k=4, max_hops=4)
    enum = [
        p["path"].split(">")
        for p in enumerate_paths(ctx.edges, START, "S1", max_hops=4, k=4).collect()
    ]
    # identical length profile (the k-shortest guarantee); tie order among
    # equal-length paths is implementation-defined in Yen's, so exact path
    # equality only holds per length class, not positionally
    assert [len(p) for p in yen] == [len(p) for p in enum]
    # every Yen path is a real, simple path in the graph
    edge_set = {(r["src"], r["dst"]) for r in ctx.edges.select("src", "dst").collect()}
    assert len({tuple(p) for p in yen}) == len(yen)
    for p in yen:
        assert p[0] == START and p[-1] == "S1" and len(set(p)) == len(p)
        for a, b in zip(p, p[1:]):
            assert (a, b) in edge_set
    # the shortest path (unique length class of size guaranteed) agrees
    assert len(yen[0]) == len(enum[0])


def test_shortest_path_same_node_is_distance_zero(ctx):
    from knowledge_graph_system_spark.operators.traversal import (
        shortest_path,
        shortest_path_length,
    )

    rows = shortest_path_length(ctx.edges, "C1", "C1").collect()
    assert [(r["src"], r["dst"], r["dist"]) for r in rows] == [("C1", "C1", 0)]
    assert shortest_path(ctx.edges, "C1", "C1") == ["C1"]


def test_bfs_paths_deterministic_choice(spark):
    from knowledge_graph_system_spark.operators.traversal import bfs_paths

    edges = spark.createDataFrame(
        [
            ("A", "B", "r1", 0.9),
            ("A", "B", "r0", 0.5),   # parallel edge: r0 < r1 wins
            ("A", "C", "r2", 0.8),
            ("B", "D", "r3", 0.7),
            ("C", "D", "r4", 0.6),   # D reachable two ways: via-B key wins (r0 < r2)
            ("D", "E", "r5", 0.4),
            ("E", "A", "r9", 0.1),   # cycle back — must not revisit
        ],
        "src string, dst string, rel_type string, confidence double",
    )
    out = {
        r["node_id"]: (r["dist"], r["path_types"], r["path_dirs"])
        for r in bfs_paths(edges, ["A"], 4).collect()
    }
    assert out == {
        "A": (0, "", ""),
        "B": (1, "r0", "O"),
        "C": (1, "r2", "O"),
        "D": (2, "r0>r3", "OO"),
        "E": (3, "r0>r3>r5", "OOO"),
    }


def test_bfs_paths_dist_matches_bfs(ctx):
    from knowledge_graph_system_spark.operators.traversal import bfs, bfs_paths

    plain = {(r["node_id"], r["dist"]) for r in bfs(ctx.edges, [START], 3).collect()}
    with_paths = {
        (r["node_id"], r["dist"]) for r in bfs_paths(ctx.edges, [START], 3).collect()
    }
    assert plain == with_paths


def test_enumerate_paths_beam_bounded(ctx):
    from knowledge_graph_system_spark.operators.traversal import (
        _PATH_BEAM_CAP,
        enumerate_paths,
    )

    # fixture never hits the cap → registered g3 is exact vs its oracle
    counts = []
    full = enumerate_paths(
        ctx.edges, START, "S1", max_hops=4, k=5, level_counts=counts
    ).collect()
    assert counts and all(c < _PATH_BEAM_CAP for c in counts)

    # with a deliberately tiny cap, per-level growth is bounded by
    # cap × max-out-degree (no exponential blowup), and top-k still comes
    # back ordered
    tiny_counts = []
    tiny = enumerate_paths(
        ctx.edges, START, "S1", max_hops=4, k=5, per_level_cap=5,
        level_counts=tiny_counts,
    ).collect()
    maxdeg = (
        ctx.edges.groupBy("src").count().agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    assert all(c <= 5 * maxdeg for c in tiny_counts)
    assert [r["hops"] for r in tiny] == sorted(r["hops"] for r in tiny)
