"""Projection + DBSCAN invariants (reference's seeded-numpy test model,
`/root/reference/tests/test_clustering.py`)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.projection import dbscan, project_embeddings


def _clustered(spark):
    """Two tight clusters + one outlier per group, deterministic."""
    rows = []
    for g in ("g1", "g2"):
        base = 1.0 if g == "g1" else -1.0
        for i in range(6):
            rows.append((g, f"{g}-a{i}", [base + 0.01 * i, 0.0, 0.0]))
        for i in range(6):
            rows.append((g, f"{g}-b{i}", [0.0, base + 0.01 * i, 0.0]))
        rows.append((g, f"{g}-noise", [50.0 * base, -40.0, 30.0]))
    return spark.createDataFrame(
        rows, "ontology string, node_id string, embedding array<double>"
    )


def test_dbscan_partitions_all_points(spark):
    df = _clustered(spark)
    out = dbscan(df, min_pts=3).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["ontology"], []).append(r["cluster"])
    for g, labels in by_group.items():
        n = len(labels)
        noise = sum(1 for c in labels if c == -1)
        sizes = {}
        for c in labels:
            if c != -1:
                sizes[c] = sizes.get(c, 0) + 1
        # FIXTURES invariant: noise + Σ cluster sizes == N
        assert noise + sum(sizes.values()) == n == 13
        assert len(sizes) == 2, f"{g}: expected 2 clusters, got {sizes}"
        assert noise == 1


def test_dbscan_deterministic(spark):
    df = _clustered(spark)
    a = sorted(map(tuple, dbscan(df, min_pts=3).collect()))
    b = sorted(map(tuple, dbscan(df, min_pts=3).collect()))
    assert a == b


def test_projection_shape_and_determinism(spark):
    df = _clustered(spark)
    out = project_embeddings(df).collect()
    assert len(out) == 26
    for r in out:
        assert math.isfinite(r["x"]) and math.isfinite(r["y"])
    again = project_embeddings(df).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_projection_separates_clusters(spark):
    df = _clustered(spark).filter(F.col("ontology") == "g1").filter(
        ~F.col("node_id").contains("noise")
    )
    pts = {r["node_id"]: (r["x"], r["y"]) for r in project_embeddings(df).collect()}
    a = [v for k, v in pts.items() if "-a" in k]
    b = [v for k, v in pts.items() if "-b" in k]
    ca = (sum(x for x, _ in a) / len(a), sum(y for _, y in a) / len(a))
    cb = (sum(x for x, _ in b) / len(b), sum(y for _, y in b) / len(b))
    spread_a = max(abs(x - ca[0]) + abs(y - ca[1]) for x, y in a)
    spread_b = max(abs(x - cb[0]) + abs(y - cb[1]) for x, y in b)
    dist = abs(ca[0] - cb[0]) + abs(ca[1] - cb[1])
    assert dist > 3 * max(spread_a, spread_b)


def test_tsne_deterministic_and_separates(spark):
    """The seeded t-SNE honors the reference contract: same seed → same
    layout, and the two tight clusters land far apart relative to their
    spread (the same invariant the PCA form satisfies)."""
    from knowledge_graph_system_spark.operators.projection import tsne_embeddings

    df = _clustered(spark).filter(F.col("ontology") == "g1")
    a = sorted(map(tuple, tsne_embeddings(df).collect()))
    b = sorted(map(tuple, tsne_embeddings(df).collect()))
    assert a == b

    pts = {r["node_id"]: (r["x"], r["y"]) for r in tsne_embeddings(df).collect()}
    ca = [v for k, v in pts.items() if "-a" in k]
    cb = [v for k, v in pts.items() if "-b" in k]
    ma = (sum(x for x, _ in ca) / len(ca), sum(y for _, y in ca) / len(ca))
    mb = (sum(x for x, _ in cb) / len(cb), sum(y for _, y in cb) / len(cb))
    spread = max(
        max(abs(x - ma[0]) + abs(y - ma[1]) for x, y in ca),
        max(abs(x - mb[0]) + abs(y - mb[1]) for x, y in cb),
    )
    dist = abs(ma[0] - mb[0]) + abs(ma[1] - mb[1])
    assert dist > 2 * spread, (dist, spread)


def test_umap_deterministic_and_separates(spark):
    """The seeded UMAP honors the reference contract: same seed → same
    layout, and the two tight clusters land far apart relative to their
    spread (same invariant as the t-SNE and PCA forms)."""
    from knowledge_graph_system_spark.operators.projection import umap_embeddings

    df = _clustered(spark).filter(F.col("ontology") == "g1")
    a = sorted(map(tuple, umap_embeddings(df).collect()))
    b = sorted(map(tuple, umap_embeddings(df).collect()))
    assert a == b

    pts = {r["node_id"]: (r["x"], r["y"]) for r in umap_embeddings(df).collect()}
    ca = [v for k, v in pts.items() if "-a" in k]
    cb = [v for k, v in pts.items() if "-b" in k]
    ma = (sum(x for x, _ in ca) / len(ca), sum(y for _, y in ca) / len(ca))
    mb = (sum(x for x, _ in cb) / len(cb), sum(y for _, y in cb) / len(cb))
    spread = max(
        max(abs(x - ma[0]) + abs(y - ma[1]) for x, y in ca),
        max(abs(x - mb[0]) + abs(y - mb[1]) for x, y in cb),
    )
    dist = abs(ma[0] - mb[0]) + abs(ma[1] - mb[1])
    assert dist > 2 * spread, (dist, spread)


def test_umap_small_n_clamp():
    """n_neighbors clamps to n-1 (floor 2); tiny groups must not error
    (reference clamp at `embedding_projection_service.py:725`)."""
    import numpy as np

    from knowledge_graph_system_spark.operators.projection import _umap

    rng = np.random.RandomState(7)
    for n in (3, 5, 12):
        out = _umap(rng.randn(n, 8), n_neighbors=15)
        assert out.shape == (n, 2)
        assert np.isfinite(out).all()


def test_umap_ab_fit_matches_known_values():
    """For min_dist=0.1, spread=1.0 umap-learn's find_ab_params gives
    a≈1.577, b≈0.895; the grid fit must land close."""
    from knowledge_graph_system_spark.operators.projection import _fit_ab

    a, b = _fit_ab(0.1, 1.0)
    assert abs(a - 1.577) < 0.15, a
    assert abs(b - 0.895) < 0.08, b


def test_project_landscape_method_switch(spark):
    from knowledge_graph_system_spark.operators.projection import project_landscape

    df = _clustered(spark).filter(F.col("ontology") == "g1")
    for m in ("pca", "tsne", "umap"):
        out = project_landscape(df, method=m)
        assert out.columns == ["ontology", "node_id", "x", "y"]
        assert out.count() == 13
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown projection method"):
        project_landscape(df, method="pacmap")


def test_tsne_perplexity_clamp():
    """Clamp formula from the reference: min(p, (n-1)//3), floored at 2,
    capped at n-1 — tiny groups must not error."""
    import numpy as np

    from knowledge_graph_system_spark.operators.projection import _tsne

    rng = np.random.RandomState(7)
    for n in (3, 5, 12):
        out = _tsne(rng.randn(n, 8), perplexity=30)
        assert out.shape == (n, 2)
        assert np.isfinite(out).all()
