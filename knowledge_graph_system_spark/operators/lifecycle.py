"""Full query-lifecycle composites (SURVEY.md §3.2/§3.3 parity).

The reference's entry points are compositions: /query/related = BFS
neighborhood → label hydration → grounding/confidence hydration
(`/root/reference/api/app/routes/queries.py:1306-1418`,
`graph_facade.py:186-224,930-967`); /connect-by-search resolves both
endpoints with vector searches before pathfinding (`:1498-1660`).
Registering the composites end-to-end proves the lifecycle — operator
chaining, not just operators — hash-matches an independent engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import oracle_snippets as osql
from ..functions.vectors import dot_expr, lit_vec, unit_vec_py
from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes
from ..functions.scale import maybe_broadcast
from .scores import _PROJ_ORACLE, grounding
from .traversal import _BROADCAST_FRONTIER_MAX, _paths_cte, bfs_paths

_START = "C7"


@query(
    "lc_related",
    oracle=graph_ctes("dedges AS (SELECT src, dst, rel_type, 'O' AS dir FROM edges)")
    + ","
    + _PROJ_ORACLE
    + ","
    + _paths_cte(_START, 3)
    + """,
ground AS (
  SELECT e.dst AS node_id,
         round(sum(coalesce(e.confidence, 0.5) * p.proj)
               / nullif(sum(coalesce(e.confidence, 0.5)), 0.0), 6) AS grounding
  FROM edges e JOIN proj p ON p.rel_type = e.rel_type
  WHERE e.rel_type LIKE 'L%'
  GROUP BY e.dst
)
SELECT nb.node_id, nb.dist, nb.path_types, n.label, n.name, n.ontology, g.grounding
FROM chosen nb
JOIN nodes n ON n.node_id = nb.node_id
LEFT JOIN ground g ON g.node_id = nb.node_id
WHERE nb.dist > 0
""",
)
def lc_related(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 `/query/related` end-to-end: depth-3 BFS neighborhood with
    rel-type path reconstruction, hydrated with node properties and
    per-concept grounding — the reference's full `/query/related`
    response shape (`graph_facade.py:258-310`) in one lazy DAG (the
    reference needs an accelerator call + 2 hydration query rounds + a
    grounding cache)."""
    ctx = Ctx.get(spark, sf_dir)
    neigh = bfs_paths(ctx.edges, [_START], 3).filter(F.col("dist") > 0)
    # depth-3 reach is O(V) on hub graphs — counted guard, not a forced
    # hint (traversal._BROADCAST_FRONTIER_MAX policy)
    return (
        maybe_broadcast(neigh.drop("path_dirs"), _BROADCAST_FRONTIER_MAX)
        .join(ctx.nodes, "node_id")
        .join(grounding(ctx.edges).select("node_id", "grounding"), "node_id", "left")
        .select("node_id", "dist", "path_types", "label", "name", "ontology", "grounding")
    )


_CBS_SEED_A = "endpoint:alpha"
_CBS_SEED_B = "endpoint:beta"


def _top1_sub(seed: str, label: str) -> str:
    emb = osql.unit_vec_cte(
        "node_id", "node_id", f"(SELECT * FROM nodes WHERE label = '{label}')"
    )
    return f"""
(SELECT node_id FROM (
   SELECT e.node_id, round({osql.dot_sql('e.emb', 'q.qv')}, 6) AS score
   FROM {emb} e,
        (SELECT list_transform(raw, x -> x / norm) AS qv FROM
         (SELECT raw, {osql.l2_norm_sql('raw')} AS norm FROM
          (SELECT {osql.raw_vec_sql("'" + seed + "'")} AS raw) t1) t2) q
 ) ORDER BY score DESC, node_id LIMIT 1)"""


@query(
    "lc_connect_by_search",
    oracle=graph_ctes()
    + f""",
src_node AS {_top1_sub(_CBS_SEED_A, 'Customer')},
dst_node AS {_top1_sub(_CBS_SEED_B, 'Supplier')},
walk(node_id, dist) AS (
  SELECT node_id, 0 FROM src_node
  UNION
  SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON e.src = w.node_id WHERE w.dist < 6
)
SELECT (SELECT node_id FROM src_node) AS src,
       (SELECT node_id FROM dst_node) AS dst,
       CAST(min(dist) AS INT) AS dist
FROM walk WHERE node_id = (SELECT node_id FROM dst_node)
HAVING min(dist) IS NOT NULL
""",
)
def lc_connect_by_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 `/connect-by-search`: two vector searches resolve the
    endpoints (top-1 Customer for seed A, top-1 Supplier for seed B),
    then shortest-path distance between them."""
    from pyspark.sql.window import Window

    from .traversal import shortest_path_length

    ctx = Ctx.get(spark, sf_dir)

    # both endpoint resolutions in ONE job: union the two scored scans
    # with a seed tag, take top-1 per seed with a window
    def scored(seed: str, label: str) -> DataFrame:
        return (
            ctx.nodes_emb.filter(F.col("label") == label)
            .withColumn("_q", lit_vec(unit_vec_py(seed)))
            .withColumn("score", F.round(dot_expr("embedding", "_q"), 6))
            .select(F.lit(seed).alias("_seed"), "node_id", "score")
        )

    tagged = scored(_CBS_SEED_A, "Customer").unionByName(
        scored(_CBS_SEED_B, "Supplier")
    )
    w = Window.partitionBy("_seed").orderBy(F.col("score").desc(), "node_id")
    top = {
        r["_seed"]: r["node_id"]
        for r in tagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    return shortest_path_length(
        ctx.edges, top[_CBS_SEED_A], top[_CBS_SEED_B], max_hops=6
    )
