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
    """Deterministic 2-component PCA via power iteration.

    The start vector is the indicator of the highest-variance dimension
    (argmax of the covariance diagonal, ties to the lowest index), NOT a
    constant vector: a constant init is exactly orthogonal to any
    principal component whose coordinates sum to zero (e.g. two clusters
    mirrored across a dimension swap), which silently converges to the
    second component and collapses the layout. The argmax-diagonal seed
    has a non-zero projection onto the top eigenvector whenever that
    eigenvector gives non-zero weight to the highest-variance dimension
    — overwhelmingly the common case, though not guaranteed (a dominant
    eigenvalue spread thinly across many dims can leave zero weight on a
    concentrated smaller one). The residual risk is accepted because the
    DuckDB oracle replays this exact algorithm: even in the pathological
    case both engines agree, and only layout quality degrades.

    Two determinism guards keep the engines in lockstep at FP epsilon:
    - the diagonal is snapped (round 9 dp) before the argmax so
      near-tied variances pick the same seed dim on both sides;
    - each converged component is sign-canonicalized (entry of largest
      snapped |value| made positive, ties to lowest index) so a seed-dim
      flip on an antisymmetric eigenvector cannot negate the output.
    """
    x = x - x.mean(axis=0)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    cov = x.T @ x
    comps = []
    for c in range(2):
        v = np.zeros(cov.shape[0])
        v[int(np.argmax(np.round(np.diag(cov), 9)))] = 1.0
        for _ in range(iters):
            v = cov @ v
            n = np.linalg.norm(v)
            if n == 0:
                break
            v = v / n
        anchor = int(np.argmax(np.round(np.abs(v), 9)))
        if v[anchor] < 0:
            v = -v
        comps.append(v)
        cov = cov - np.outer(v, cov @ v)
    w = np.stack(comps, axis=1)
    return x @ w


def project_embeddings(nodes_emb: DataFrame, group_col: str = "ontology") -> DataFrame:
    """F5: per-group 2-D projection via applyInPandas (Arrow batches).

    Rounding happens Spark-side (F.round, HALF_UP) not in numpy
    (np.round is half-to-even) so the output matches the DuckDB oracle's
    round() rule like every other registered float column.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        xy = _pca2(x) if len(pdf) >= 3 else np.zeros((len(pdf), 2))
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                "node_id": pdf["node_id"],
                "x": xy[:, 0],
                "y": xy[:, 1],
            }
        )

    return (
        nodes_emb.select(group_col, "node_id", "embedding")
        .groupBy(group_col)
        .applyInPandas(fit, schema=f"{group_col} string, node_id string, x double, y double")
        .withColumn("x", F.round("x", 6))
        .withColumn("y", F.round("y", 6))
    )


def _tsne(
    x: np.ndarray,
    n_components: int = 2,
    perplexity: int = 30,
    random_state: int = 42,
    iters: int = 250,
) -> np.ndarray:
    """Deterministic t-SNE reproducing the reference's contract
    (`embedding_projection_service.py:641-751`): center → L2-normalize →
    perplexity clamp `min(p, (n-1)//3)` floored at 2 and capped at n-1 →
    PCA init for n > 50 else seeded random (random_state=42) → standard
    KL gradient descent with early exaggeration. Pure numpy — the
    per-group batch runs inside applyInPandas like `_pca2`."""
    n = len(x)
    x = x - x.mean(axis=0)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms

    eff = min(perplexity, (n - 1) // 3)
    if eff < 5:
        eff = max(2, eff)
    eff = min(eff, n - 1)

    # cosine distances on the normalized vectors (reference metric)
    d = np.maximum(1.0 - x @ x.T, 0.0)
    np.fill_diagonal(d, 0.0)

    # per-point sigma via binary search to hit log(perplexity) entropy
    target = np.log(eff)
    P = np.zeros((n, n))
    for i in range(n):
        lo, hi, beta = 1e-20, 1e20, 1.0
        di = np.delete(d[i], i)
        for _ in range(50):
            p = np.exp(-di * beta)
            s = p.sum()
            if s <= 0:
                h, p = 0.0, np.zeros_like(p)
            else:
                p = p / s
                h = -np.sum(p * np.log(np.maximum(p, 1e-12)))
            if abs(h - target) < 1e-5:
                break
            if h > target:
                lo, beta = beta, beta * 2 if hi >= 1e20 else (beta + hi) / 2
            else:
                hi, beta = beta, (beta + lo) / 2
        P[i, np.arange(n) != i] = p
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)

    if n > 50:
        y = _pca2(x, iters=50)[:, :n_components] * 1e-2
    else:
        y = np.random.RandomState(random_state).randn(n, n_components) * 1e-4

    lr = max(n / 12.0, 50.0)  # sklearn's learning_rate="auto"
    vel = np.zeros_like(y)
    for it in range(iters):
        exaggeration = 4.0 if it < 50 else 1.0
        num = 1.0 / (1.0 + ((y[:, None, :] - y[None, :, :]) ** 2).sum(-1))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        PQ = (exaggeration * P - Q) * num
        grad = 4.0 * ((np.diag(PQ.sum(axis=1)) - PQ) @ y)
        momentum = 0.5 if it < 100 else 0.8
        vel = momentum * vel - lr * grad
        y = y + vel
        y = y - y.mean(axis=0)
    return y


def tsne_embeddings(
    nodes_emb: DataFrame,
    group_col: str = "ontology",
    perplexity: int = 30,
    random_state: int = 42,
) -> DataFrame:
    """F5's t-SNE form: per-group seeded neighbor embedding via
    applyInPandas. The registered `f5_projection` keeps the PCA form
    (SQL-oracle-able); this variant carries the reference's full
    perplexity/seed contract and is pinned by determinism + separation
    tests (no closed form for an oracle)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        if len(pdf) >= 3:
            xy = _tsne(x, perplexity=perplexity, random_state=random_state)
        else:
            xy = np.zeros((len(pdf), 2))
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                "node_id": pdf["node_id"],
                "x": xy[:, 0],
                "y": xy[:, 1],
            }
        )

    return (
        nodes_emb.select(group_col, "node_id", "embedding")
        .groupBy(group_col)
        .applyInPandas(fit, schema=f"{group_col} string, node_id string, x double, y double")
    )


def _fit_ab(min_dist: float = 0.1, spread: float = 1.0) -> tuple[float, float]:
    """Fit UMAP's (a, b) curve params: 1/(1 + a·d^{2b}) least-squares
    against the piecewise target exp(-(d - min_dist)/spread) for
    d ≥ min_dist else 1 (umap-learn's find_ab_params contract,
    `embedding_projection_service.py:723-730` passes min_dist/spread
    straight through). Deterministic coarse-to-fine grid search — no
    scipy dependency."""
    d = np.linspace(0.0, 3.0 * spread, 300)
    target = np.where(d < min_dist, 1.0, np.exp(-(d - min_dist) / spread))

    def err(a: float, b: float) -> float:
        return float(((1.0 / (1.0 + a * d ** (2.0 * b)) - target) ** 2).sum())

    a_lo, a_hi, b_lo, b_hi = 0.1, 10.0, 0.3, 3.0
    best = (1.0, 1.0)
    for _ in range(4):
        grid_a = np.linspace(a_lo, a_hi, 25)
        grid_b = np.linspace(b_lo, b_hi, 25)
        best = min(
            ((a, b) for a in grid_a for b in grid_b), key=lambda ab: err(*ab)
        )
        da, db = (a_hi - a_lo) / 12, (b_hi - b_lo) / 12
        a_lo, a_hi = max(best[0] - da, 1e-3), best[0] + da
        b_lo, b_hi = max(best[1] - db, 1e-3), best[1] + db
    return best


def _umap(
    x: np.ndarray,
    n_components: int = 2,
    n_neighbors: int = 15,
    min_dist: float = 0.1,
    spread: float = 1.0,
    random_state: int = 42,
    iters: int = 200,
) -> np.ndarray:
    """Deterministic UMAP reproducing the reference's contract
    (`embedding_projection_service.py:719-731`): center → L2-normalize →
    cosine metric → n_neighbors clamped to n-1 → fuzzy simplicial set
    (per-point rho/sigma calibrated to log2(k)) → seeded layout.

    Deviation from umap-learn, documented: the layout phase is FULL-BATCH
    gradient descent on the UMAP cross-entropy (attraction over the kNN
    graph, exact repulsion over all pairs) instead of per-edge SGD with
    negative sampling — per-ontology groups are bounded (SURVEY §2 F5),
    so O(n²) per step is affordable and the result is exactly
    reproducible without a shared-memory RNG."""
    n = len(x)
    x = x - x.mean(axis=0)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms

    k = max(2, min(n_neighbors, n - 1))

    d = np.maximum(1.0 - x @ x.T, 0.0)
    np.fill_diagonal(d, np.inf)
    # stable argsort → deterministic neighbor sets under ties
    nbr = np.argsort(d, axis=1, kind="stable")[:, :k]

    # fuzzy simplicial set: rho = nearest distance; sigma solves
    # Σ exp(-(d - rho)/sigma) = log2(k) (umap's smooth-kNN calibration)
    rho = d[np.arange(n)[:, None], nbr[:, :1]].ravel()
    target = np.log2(k)
    W = np.zeros((n, n))
    for i in range(n):
        di = np.maximum(d[i, nbr[i]] - rho[i], 0.0)
        lo, hi, sig = 0.0, np.inf, 1.0
        for _ in range(64):
            s = np.exp(-di / max(sig, 1e-12)).sum()
            if abs(s - target) < 1e-5:
                break
            if s > target:
                hi, sig = sig, (sig + lo) / 2
            else:
                lo, sig = sig, sig * 2 if hi == np.inf else (sig + hi) / 2
        W[i, nbr[i]] = np.exp(-di / max(sig, 1e-12))
    P = W + W.T - W * W.T  # probabilistic t-conorm symmetrization

    if n > 50:
        y = _pca2(x, iters=50)[:, :n_components]
        scale = np.abs(y).max()
        y = y / (scale if scale > 0 else 1.0) * 10.0
    else:
        y = np.random.RandomState(random_state).randn(n, n_components) * 1e-2

    a, b = _fit_ab(min_dist, spread)
    for it in range(iters):
        lr = 1.0 * (1.0 - it / iters)
        diff = y[:, None, :] - y[None, :, :]
        d2 = np.maximum((diff**2).sum(-1), 1e-8)
        phi_den = 1.0 + a * d2**b
        attract = P * (2.0 * a * b * d2 ** (b - 1.0)) / phi_den
        repel = (1.0 - P) * (2.0 * b) / ((1e-3 + d2) * phi_den)
        coef = attract - repel
        np.fill_diagonal(coef, 0.0)
        grad = np.clip((coef[:, :, None] * diff).sum(axis=1), -4.0, 4.0)
        y = y - lr * grad
        y = y - y.mean(axis=0)
    return y


def umap_embeddings(
    nodes_emb: DataFrame,
    group_col: str = "ontology",
    n_neighbors: int = 15,
    min_dist: float = 0.1,
    spread: float = 1.0,
    random_state: int = 42,
) -> DataFrame:
    """F5's UMAP form: per-group seeded manifold layout via applyInPandas
    (same Arrow-batch shape as `tsne_embeddings`). Pinned by determinism
    + separation tests; the registered `f5_projection` keeps the
    SQL-oracle-able PCA form."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        if len(pdf) >= 3:
            xy = _umap(
                x,
                n_neighbors=n_neighbors,
                min_dist=min_dist,
                spread=spread,
                random_state=random_state,
            )
        else:
            xy = np.zeros((len(pdf), 2))
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                "node_id": pdf["node_id"],
                "x": xy[:, 0],
                "y": xy[:, 1],
            }
        )

    return (
        nodes_emb.select(group_col, "node_id", "embedding")
        .groupBy(group_col)
        .applyInPandas(fit, schema=f"{group_col} string, node_id string, x double, y double")
    )


def project_landscape(
    nodes_emb: DataFrame, method: str = "tsne", group_col: str = "ontology", **kw
) -> DataFrame:
    """The reference's algorithm switch (`embedding_projection_service.
    py:644,719`): method ∈ {pca, tsne, umap}, same output schema either
    way. Unknown methods fail closed like the reference's ValueError."""
    if method == "pca":
        return project_embeddings(nodes_emb, group_col=group_col)
    if method == "tsne":
        return tsne_embeddings(nodes_emb, group_col=group_col, **kw)
    if method == "umap":
        return umap_embeddings(nodes_emb, group_col=group_col, **kw)
    raise ValueError(f"unknown projection method {method!r} (pca|tsne|umap)")


def dbscan(
    nodes_emb: DataFrame, group_col: str = "ontology", min_pts: int = 4
) -> DataFrame:
    """F6: per-group DBSCAN with eps = 40th-percentile kNN distance
    (floors mirrored from the reference,
    `embedding_projection_service.py:753-816`). Returns (group, node_id,
    cluster) with cluster = -1 for noise.

    This is the ORDER-FREE formulation of DBSCAN, chosen so the result
    is a pure function of the point set and SQL-expressible (the DuckDB
    oracle replays it exactly):
    - core points: ≥ min_pts neighbors within eps (self included);
    - clusters = connected components of the core-core proximity graph,
      numbered 0,1,... by each component's minimal member node_id;
    - border points join the cluster of their minimal-node_id core
      neighbor (classic DBSCAN leaves border assignment to visit order —
      this pins it);
    - everything else is noise (-1).
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        n = len(pdf)
        ids = list(pdf["node_id"])
        # Gram-matrix distances (r17, guide §4.2): the broadcasting form
        # ((x[:,None,:]-x[None,:,:])**2).sum(-1) allocates an n²×D
        # float64 tensor (4.6 GB per group at sf0.1) and runs without
        # BLAS; |a|²+|b|²−2a·b is one matmul over an n² buffer. The
        # within-eps masks (the ONLY downstream consumer of d) were
        # verified bit-identical at every gate SF.
        sq = (x * x).sum(axis=1)
        d = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0))
        k = min(min_pts, n - 1) if n > 1 else 1
        knn = np.sort(d, axis=1)[:, k] if n > 1 else np.zeros(n)
        eps = max(float(np.percentile(knn, 40)), 1e-3)
        within = d <= eps
        is_core = within.sum(axis=1) >= min_pts

        # union-find over core points (exact integer work, no FP order)
        parent = list(range(n))

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        core_idx = np.where(is_core)[0]
        for i in core_idx:
            for j in np.where(within[i] & is_core)[0]:
                ri, rj = find(int(i)), find(int(j))
                if ri != rj:
                    parent[rj] = ri

        comp_min: dict[int, str] = {}
        for i in core_idx:
            r = find(int(i))
            m = comp_min.get(r)
            if m is None or ids[i] < m:
                comp_min[r] = ids[i]
        cluster_of_min = {m: c for c, m in enumerate(sorted(comp_min.values()))}

        labels = np.full(n, -1)
        for i in core_idx:
            labels[i] = cluster_of_min[comp_min[find(int(i))]]
        for i in np.where(~is_core)[0]:
            nbrs = [int(j) for j in np.where(within[i] & is_core)[0]]
            if nbrs:
                labels[i] = labels[min(nbrs, key=lambda j: ids[j])]
        return pd.DataFrame(
            {group_col: pdf[group_col], "node_id": pdf["node_id"], "cluster": labels}
        )

    return (
        nodes_emb.select(group_col, "node_id", "embedding")
        .groupBy(group_col)
        .applyInPandas(fit, schema=f"{group_col} string, node_id string, cluster int")
    )


def _emb_long_ctes() -> list[str]:
    """Shared oracle prelude: Customer unit embeddings exploded to long
    form (node_id, g, d, v) plus per-group sizes — the exact twin of
    `ctx.nodes_emb.filter(label = 'Customer')`."""
    from ..functions.vectors import DEFAULT_DIM

    uv = osql.unit_vec_cte(
        "node_id", "node_id, ontology",
        "(SELECT node_id, ontology FROM nodes WHERE label = 'Customer')",
    )
    # MATERIALIZED everywhere: DuckDB would otherwise inline each CTE at
    # every reference, and the unrolled power-iteration chain then expands
    # exponentially (observed as a file-handle explosion on the base scan)
    return [
        f"memb AS MATERIALIZED (SELECT node_id, ontology, emb FROM {uv} m)",
        f"pt AS MATERIALIZED (SELECT node_id, ontology AS g, gs.d AS d, emb[gs.d] AS v"
        f" FROM memb, generate_series(1, {DEFAULT_DIM}) AS gs(d))",
        "gn AS MATERIALIZED (SELECT ontology AS g, count(*) AS n FROM memb GROUP BY ontology)",
    ]


def _f5_oracle(iters: int = 50) -> str:
    """DuckDB replay of `_pca2`: center → row-normalize → covariance →
    two power-iteration components (argmax-diagonal indicator init,
    ties to lowest dimension, `iters` normalized iterations, deflation
    between components) → project. The iteration is generated as an
    unrolled CTE chain; power iteration is contractive, so cross-engine
    FP summation-order differences stay at machine epsilon and vanish
    under round(·, 6)."""
    parts = _emb_long_ctes() + [
        "ctr AS MATERIALIZED (SELECT g, d, avg(v) AS mu FROM pt GROUP BY g, d)",
        "xc AS MATERIALIZED (SELECT p.node_id, p.g, p.d, p.v - c.mu AS v"
        " FROM pt p JOIN ctr c ON c.g = p.g AND c.d = p.d)",
        "rnorm AS MATERIALIZED (SELECT node_id, g, sqrt(sum(v*v)) AS nrm FROM xc GROUP BY node_id, g)",
        "x AS MATERIALIZED (SELECT xc.node_id, xc.g, xc.d,"
        " xc.v / (CASE WHEN r.nrm = 0 THEN 1.0 ELSE r.nrm END) AS v"
        " FROM xc JOIN rnorm r ON r.node_id = xc.node_id AND r.g = xc.g)",
        "cov0 AS MATERIALIZED (SELECT a.g, a.d AS i, b.d AS j, sum(a.v * b.v) AS c"
        " FROM x a JOIN x b ON b.g = a.g AND b.node_id = a.node_id"
        " GROUP BY a.g, a.d, b.d)",
    ]
    for comp, cov in ((1, "cov0"), (2, "cov1")):
        # diagonal snapped (round 9 dp) before the argmax, mirroring
        # _pca2: near-tied variances must pick the same seed dim in both
        # engines or an antisymmetric eigenvector flips sign
        parts.append(
            f"seed{comp} AS MATERIALIZED (SELECT g, d FROM"
            f" (SELECT g, i AS d, row_number() OVER (PARTITION BY g ORDER BY round(c, 9) DESC, i) AS rn"
            f"  FROM {cov} WHERE i = j) WHERE rn = 1)"
        )
        parts.append(
            f"v{comp}_0 AS MATERIALIZED (SELECT p.g, p.d,"
            f" CASE WHEN p.d = s.d THEN 1.0 ELSE 0.0 END AS v"
            f" FROM (SELECT DISTINCT g, d FROM pt) p JOIN seed{comp} s ON s.g = p.g)"
        )
        for t in range(1, iters + 1):
            parts.append(
                f"w{comp}_{t} AS MATERIALIZED (SELECT c.g, c.i AS d, sum(c.c * v.v) AS w"
                f" FROM {cov} c JOIN v{comp}_{t-1} v ON v.g = c.g AND v.d = c.j"
                f" GROUP BY c.g, c.i)"
            )
            parts.append(
                f"v{comp}_{t} AS MATERIALIZED (SELECT g, d,"
                f" w / nullif(sqrt(sum(w*w) OVER (PARTITION BY g)), 0) AS v"
                f" FROM w{comp}_{t})"
            )
        if comp == 1:
            parts.append(
                f"u1 AS MATERIALIZED (SELECT c.g, c.i AS d, sum(c.c * v.v) AS u"
                f" FROM cov0 c JOIN v1_{iters} v ON v.g = c.g AND v.d = c.j"
                f" GROUP BY c.g, c.i)"
            )
            parts.append(
                f"cov1 AS MATERIALIZED (SELECT c.g, c.i, c.j, c.c - v.v * u.u AS c"
                f" FROM cov0 c JOIN v1_{iters} v ON v.g = c.g AND v.d = c.i"
                f" JOIN u1 u ON u.g = c.g AND u.d = c.j)"
            )
    # sign canonicalization, mirroring _pca2: make the entry of largest
    # snapped |value| positive (ties to lowest d). Deflation above is
    # sign-invariant (v appears twice), so only the projection needs the
    # canonical components.
    for comp in (1, 2):
        parts.append(
            f"sgn{comp} AS MATERIALIZED (SELECT g,"
            f" CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS s FROM"
            f" (SELECT g, v, row_number() OVER"
            f"  (PARTITION BY g ORDER BY round(abs(v), 9) DESC, d) AS rn"
            f"  FROM v{comp}_{iters}) WHERE rn = 1)"
        )
        parts.append(
            f"vf{comp} AS MATERIALIZED (SELECT v.g, v.d, v.v * s.s AS v"
            f" FROM v{comp}_{iters} v JOIN sgn{comp} s ON s.g = v.g)"
        )
    parts.append(
        "proj AS MATERIALIZED (SELECT x.node_id, x.g, sum(x.v * a.v) AS px, sum(x.v * b.v) AS py"
        " FROM x JOIN vf1 a ON a.g = x.g AND a.d = x.d"
        " JOIN vf2 b ON b.g = x.g AND b.d = x.d"
        " GROUP BY x.node_id, x.g)"
    )
    return graph_ctes(*parts) + """
SELECT p.g AS ontology, p.node_id,
       CASE WHEN gn.n < 3 THEN 0.0 ELSE round(p.px, 6) END AS x,
       CASE WHEN gn.n < 3 THEN 0.0 ELSE round(p.py, 6) END AS y
FROM proj p JOIN gn ON gn.g = p.g
"""


def _f6_oracle(min_pts: int = 4) -> str:
    """DuckDB replay of the order-free DBSCAN: kNN-percentile eps, core
    points, recursive min-label connected components over the core-core
    proximity graph, min-core border assignment, -1 noise."""
    parts = _emb_long_ctes() + [
        "dist AS MATERIALIZED (SELECT a.g, a.node_id AS i, b.node_id AS j,"
        " sqrt(sum((a.v - b.v)*(a.v - b.v))) AS dd"
        " FROM pt a JOIN pt b ON b.g = a.g AND b.d = a.d"
        " GROUP BY a.g, a.node_id, b.node_id)",
        f"knn AS MATERIALIZED (SELECT d.g, d.i, d.dd FROM"
        f" (SELECT dist.*, row_number() OVER (PARTITION BY g, i ORDER BY dd, j) AS rn"
        f"  FROM dist) d JOIN gn ON gn.g = d.g"
        f" WHERE d.rn = least({min_pts}, gn.n - 1) + 1)",
        "epst AS MATERIALIZED (SELECT g, greatest(quantile_cont(dd, 0.4), 0.001) AS eps"
        " FROM knn GROUP BY g)",
        "ncnt AS MATERIALIZED (SELECT d.g, d.i, count(*) AS nc FROM dist d"
        " JOIN epst e ON e.g = d.g WHERE d.dd <= e.eps GROUP BY d.g, d.i)",
        f"core AS MATERIALIZED (SELECT g, i FROM ncnt WHERE nc >= {min_pts})",
        "core_edge AS MATERIALIZED (SELECT d.g, d.i AS a, d.j AS b FROM dist d"
        " JOIN epst e ON e.g = d.g"
        " JOIN core c1 ON c1.g = d.g AND c1.i = d.i"
        " JOIN core c2 ON c2.g = d.g AND c2.i = d.j"
        " WHERE d.dd <= e.eps)",
        "reach(g, node, comp) AS ("
        " SELECT g, i, i FROM core"
        " UNION"
        " SELECT e.g, e.b, r.comp FROM reach r"
        " JOIN core_edge e ON e.g = r.g AND e.a = r.node)",
        "comp AS MATERIALIZED (SELECT g, node, min(comp) AS root FROM reach GROUP BY g, node)",
        "rootz AS MATERIALIZED (SELECT g, root,"
        " dense_rank() OVER (PARTITION BY g ORDER BY root) - 1 AS cluster"
        " FROM (SELECT DISTINCT g, root FROM comp))",
        "core_lab AS MATERIALIZED (SELECT c.g, c.node, r.cluster FROM comp c"
        " JOIN rootz r ON r.g = c.g AND r.root = c.root)",
        "border AS MATERIALIZED (SELECT d.g, d.i AS node, min(d.j) AS core_nbr FROM dist d"
        " JOIN epst e ON e.g = d.g"
        " JOIN core c ON c.g = d.g AND c.i = d.j"
        " LEFT JOIN core s ON s.g = d.g AND s.i = d.i"
        " WHERE d.dd <= e.eps AND s.i IS NULL GROUP BY d.g, d.i)",
        "border_lab AS MATERIALIZED (SELECT b.g, b.node, cl.cluster FROM border b"
        " JOIN core_lab cl ON cl.g = b.g AND cl.node = b.core_nbr)",
        "lab AS MATERIALIZED (SELECT m.ontology AS g, m.node_id AS node,"
        " coalesce(cl.cluster, bl.cluster, -1) AS cluster FROM memb m"
        " LEFT JOIN core_lab cl ON cl.g = m.ontology AND cl.node = m.node_id"
        " LEFT JOIN border_lab bl ON bl.g = m.ontology AND bl.node = m.node_id)",
    ]
    return graph_ctes(*parts) + """
SELECT g AS ontology, cluster, count(*) AS n FROM lab GROUP BY g, cluster
"""


@query("f5_projection", oracle=_f5_oracle())
def f5_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: 2-D coordinates per Customer node, per market segment. The
    oracle replays the seeded power-iteration PCA in unrolled DuckDB SQL
    (semantics per `embedding_projection_service.py:641-751`: center →
    normalize → deterministic projection)."""
    ctx = Ctx.get(spark, sf_dir)
    return project_embeddings(
        ctx.nodes_emb.filter(F.col("label") == "Customer")
    )


@query("f6_dbscan", oracle=_f6_oracle())
def f6_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: DBSCAN cluster sizes per segment, order-free formulation —
    the oracle replays eps derivation, core detection, and the
    connected-component labeling in recursive SQL."""
    ctx = Ctx.get(spark, sf_dir)
    labels = dbscan(ctx.nodes_emb.filter(F.col("label") == "Customer"))
    # no final orderBy (r17, guide §2.4): order-insensitive hash, no
    # LIMIT — the sort's Exchange bought nothing
    return labels.groupBy("ontology", "cluster").agg(F.count("*").alias("n"))


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
