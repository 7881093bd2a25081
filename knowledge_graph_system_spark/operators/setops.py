"""SO9 dispatch + registered GraphProgram demo (SURVEY.md §2.7).

`make_dispatch` maps statement sources to engine operators the way the
reference's program_dispatch maps them to API ops
(`/root/reference/api/app/services/program_dispatch.py:193-394`):
  match        → filtered node scan (P1)
  neighborhood → BFS node set hydrated with node props (G1 + J4)
  vector      → cosine top-k (V1)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import unit_vec_py
from ..plans.program import Result, WorkingGraph, execute_program
from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes


def make_dispatch(ctx: Ctx):
    def dispatch(source: dict) -> Result:
        kind = source["kind"]
        if kind == "match":
            df = ctx.nodes
            if "label" in source:
                df = df.filter(F.col("label") == source["label"])
            if "labels" in source:
                df = df.filter(F.col("label").isin(source["labels"]))
            if "min_weight" in source:
                df = df.filter(F.col("weight") > source["min_weight"])
            if "max_weight" in source:
                df = df.filter(F.col("weight") < source["max_weight"])
            if "ontology" in source:
                df = df.filter(F.col("ontology") == source["ontology"])
            return Result(nodes=df)
        if kind == "neighborhood":
            from .traversal import bfs, subgraph

            nset = bfs(
                ctx.edges,
                [source["start"]],
                source.get("depth", 1),
                direction=source.get("direction", "out"),
            )
            nodes = ctx.nodes.join(F.broadcast(nset.select("node_id")), "node_id")
            return Result(nodes=nodes, links=subgraph(ctx.edges, nset))
        if kind == "vector":
            from .vector import vector_search

            hits = vector_search(
                ctx.nodes_emb,
                unit_vec_py(source["seed"]),
                threshold=source.get("threshold", 0.3),
                k=source.get("k", 50),
            )
            return Result(nodes=ctx.nodes.join(F.broadcast(hits.select("node_id")), "node_id"))
        raise ValueError(f"unknown source kind {kind!r}")

    return dispatch


def empty_working(ctx: Ctx) -> WorkingGraph:
    return WorkingGraph(
        nodes=ctx.nodes.filter(F.lit(False)),
        links=ctx.edges.filter(F.lit(False)),
    )


_DEMO_PROGRAM = [
    {"op": "+", "source": {"kind": "match", "label": "Part", "min_weight": 950.0}},
    {"op": "!", "source": {"kind": "neighborhood", "start": "C1", "depth": 2}},
    {"op": "&", "source": {"kind": "match", "labels": ["Part", "Order"]}},
    {"op": "-", "source": {"kind": "match", "max_weight": 920.0}},
    {"op": "?", "source": {"kind": "match", "ontology": "NO_SUCH_ONTOLOGY"}},
]


@query(
    "so_program_demo",
    oracle=graph_ctes()
    + """,
walk(node_id, dist) AS (
  SELECT 'C1', 0
  UNION
  SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON e.src = w.node_id WHERE w.dist < 2
),
r1 AS (SELECT node_id, label, weight FROM nodes WHERE label = 'Part' AND weight > 950.0),
r2 AS (SELECT n.node_id, n.label, n.weight
       FROM nodes n JOIN (SELECT DISTINCT node_id FROM walk) w ON w.node_id = n.node_id),
-- DISTINCT over UNION ALL, not bare UNION: DuckDB 1.0.0 treats UNION in
-- a non-recursive CTE under WITH RECURSIVE as UNION ALL (no dedup)
u AS (SELECT DISTINCT * FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)),
i AS (SELECT * FROM u WHERE label IN ('Part', 'Order')),
d AS (SELECT * FROM i WHERE NOT (weight < 920.0))
SELECT node_id, label FROM d
""",
)
def so_program_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A 5-statement GraphProgram through the real executor:
    `+` part search, `!` assert C1 2-hop neighborhood, `&` intersect
    labels, `-` remove light nodes, `?` optional no-op. The oracle is the
    equivalent UNION/INTERSECT/EXCEPT SQL."""
    ctx = Ctx.get(spark, sf_dir)
    # Warm the cached graph views BEFORE execute_program starts the 60 s
    # deadline clock: the reference's executor also runs against an
    # already-loaded graph (`program_executor.py:43` times statements, not
    # the engine bootstrap). On cold driver hardware the first touch of
    # ctx.nodes/ctx.edges is parquet scan + repartition + cache fill —
    # chargeable to session setup, not the program.
    ctx.nodes.count()
    ctx.edges.count()
    # collect_counts=False: one Spark job per statement (nodes checkpoint)
    # instead of three — the step log keeps op + ms, counts read -1.
    res = execute_program(
        _DEMO_PROGRAM, make_dispatch(ctx), empty_working(ctx), collect_counts=False
    )
    assert not res.aborted, res.abort_reason
    return res.working.nodes.select("node_id", "label")
