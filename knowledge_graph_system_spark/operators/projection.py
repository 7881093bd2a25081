"""Embedding analytics: projection, clustering, centroids (F5-F7).

Reference parity:
- F5 t-SNE/UMAP 2-D projection per ontology: center → L2-normalize →
  project, seeded (`/root/reference/api/app/services/
  embedding_projection_service.py:641-751`). sklearn isn't in this
  container, so the projector is deterministic power-iteration PCA in
  numpy — same contract (per-group 2-D layout), swappable for t-SNE.
- F6 DBSCAN with data-derived eps (40th-pct kNN distance)
  (`embedding_projection_service.py:753-816`) — numpy implementation.
- F7 centroid recompute from top-K degree members
  (`api/app/lib/ontology_scorer.py:301-408`).

Scale shape: per-ontology groups are BOUNDED (the reference projects ≤ a
few thousand embeddings per ontology), so `applyInPandas` gives each
group to one worker as an Arrow batch — the 100 TB pattern for
"small-N-per-group sklearn-ish work", while F7 stays pure SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import oracle_snippets as osql
from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes

_TOP_K_DEGREE = 5


def _pca2(x: np.ndarray, iters: int = 50) -> np.ndarray:
    """Deterministic 2-component PCA via power iteration (fixed init)."""
    x = x - x.mean(axis=0)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    cov = x.T @ x
    comps = []
    for c in range(2):
        v = np.ones(cov.shape[0]) / np.sqrt(cov.shape[0])
        for _ in range(iters):
            v = cov @ v
            n = np.linalg.norm(v)
            if n == 0:
                break
            v = v / n
        comps.append(v)
        cov = cov - np.outer(v, cov @ v)
    w = np.stack(comps, axis=1)
    return x @ w


def project_embeddings(nodes_emb: DataFrame, group_col: str = "ontology") -> DataFrame:
    """F5: per-group 2-D projection via applyInPandas (Arrow batches)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        xy = _pca2(x) if len(pdf) >= 3 else np.zeros((len(pdf), 2))
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                "node_id": pdf["node_id"],
                "x": np.round(xy[:, 0], 6),
                "y": np.round(xy[:, 1], 6),
            }
        )

    return (
        nodes_emb.select(group_col, "node_id", "embedding")
        .groupBy(group_col)
        .applyInPandas(fit, schema=f"{group_col} string, node_id string, x double, y double")
    )


def dbscan(
    nodes_emb: DataFrame, group_col: str = "ontology", min_pts: int = 4
) -> DataFrame:
    """F6: per-group DBSCAN with eps = 40th-percentile kNN distance
    (floors mirrored from the reference). Returns (group, node_id,
    cluster) with cluster = -1 for noise."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        n = len(pdf)
        d = np.sqrt(np.maximum(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1), 0.0))
        k = min(min_pts, n - 1) if n > 1 else 1
        knn = np.sort(d, axis=1)[:, k] if n > 1 else np.zeros(n)
        eps = max(float(np.percentile(knn, 40)), 1e-3)
        labels = np.full(n, -1)
        cluster = 0
        for i in np.argsort(pdf["node_id"].values):  # deterministic seed order
            if labels[i] != -1:
                continue
            neigh = np.where(d[i] <= eps)[0]
            if len(neigh) < min_pts:
                continue
            labels[i] = cluster
            queue = list(neigh)
            while queue:
                j = queue.pop()
                if labels[j] == -1:
                    labels[j] = cluster
                    jn = np.where(d[j] <= eps)[0]
                    if len(jn) >= min_pts:
                        queue.extend(jj for jj in jn if labels[jj] == -1)
            cluster += 1
        return pd.DataFrame(
            {group_col: pdf[group_col], "node_id": pdf["node_id"], "cluster": labels}
        )

    return (
        nodes_emb.select(group_col, "node_id", "embedding")
        .groupBy(group_col)
        .applyInPandas(fit, schema=f"{group_col} string, node_id string, cluster int")
    )


@query("f5_projection", oracle=None)
def f5_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: 2-D coordinates per Customer node (projection has
    no SQL oracle; determinism is pinned by tests/test_projection.py)."""
    ctx = Ctx.get(spark, sf_dir)
    return project_embeddings(
        ctx.nodes_emb.filter(F.col("label") == "Customer")
    )


@query("f6_dbscan", oracle=None)
def f6_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: DBSCAN cluster sizes per segment (invariants —
    noise + Σ sizes == N — are asserted in tests)."""
    ctx = Ctx.get(spark, sf_dir)
    labels = dbscan(ctx.nodes_emb.filter(F.col("label") == "Customer"))
    return (
        labels.groupBy("ontology", "cluster")
        .agg(F.count("*").alias("n"))
        .orderBy("ontology", "cluster")
    )


@query(
    "f7_centroids",
    oracle=graph_ctes()
    + f""",
deg AS (SELECT dst AS node_id, count(*) AS d FROM edges GROUP BY dst),
members AS (
  SELECT n.node_id, n.ontology FROM nodes n JOIN deg ON deg.node_id = n.node_id
  WHERE n.label = 'Part'
  QUALIFY row_number() OVER (PARTITION BY n.ontology ORDER BY deg.d DESC, n.node_id) <= {_TOP_K_DEGREE}
),
memb AS (SELECT node_id, ontology, emb FROM {osql.unit_vec_cte('node_id', 'node_id, ontology', 'members')} m)
SELECT ontology, g.d AS dim, round(avg(emb[g.d]), 6) AS centroid
FROM memb, generate_series(1, 16) AS g(d)
GROUP BY ontology, g.d
""",
)
def f7_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: per-ontology centroid of the top-K degree members' embeddings
    (long form: one row per dimension so the oracle stays pure SQL)."""
    ctx = Ctx.get(spark, sf_dir)
    deg = ctx.edges.groupBy(F.col("dst").alias("node_id")).agg(F.count("*").alias("d"))
    members = (
        ctx.nodes_emb.filter(F.col("label") == "Part")
        .join(deg, "node_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("ontology").orderBy(F.col("d").desc(), "node_id")
            ),
        )
        .filter(F.col("rn") <= _TOP_K_DEGREE)
    )
    return (
        members.select("ontology", F.posexplode("embedding").alias("dim0", "v"))
        .groupBy("ontology", (F.col("dim0") + 1).alias("dim"))
        .agg(F.round(F.avg("v"), 6).alias("centroid"))
    )
