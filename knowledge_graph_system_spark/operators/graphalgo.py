"""Whole-graph analytics: PageRank and label-propagation communities.

The reference ranks concepts by degree only (`A1`/`G5`,
`api/app/routes/queries.py` top-degree listing); production graph
analytics wants importance and community structure too. Both operators
here are FIXED-ITERATION versions — the form that is (a) what a
scheduled corpus-build pipeline actually runs (a bounded number of
sweeps, not convergence polling) and (b) exactly expressible as a
chained-CTE DuckDB oracle, so cross-engine parity is testable
row-for-row.

- `pagerank(nodes, edges, iters)`: standard damped PageRank
  (Page & Brin 1999 — public literature). Per iteration: one join of
  the rank frame to the out-edge frame + one aggregation by dst —
  two exchanges per sweep, both on node keys; the out-degree frame is
  computed once. Dangling mass (nodes with no out-edges) is
  redistributed uniformly each sweep, so ranks sum to 1. Ranks are
  rounded to 10 dp each sweep IN BOTH ENGINES — that absorbs the
  sub-ulp differences from engine summation order that would
  otherwise compound across iterations — and to 6 dp on output.
- `label_propagation(nodes, edges, iters)`: synchronous LPA
  (Raghavan et al. 2007): each sweep every node adopts the most
  frequent label among its undirected neighbors, ties broken by the
  SMALLEST label — fully deterministic, integer/string arithmetic
  only, so the oracle parity is exact with no rounding at all.

Scale: both are iterative joins on the edge frame — the frame is
loaded once and reused per sweep (Ctx caching upstream); at 100 TB
each sweep is the canonical shuffle-on-node-key; iteration counts are
small constants. Spark-side lineage is cut per sweep with
localCheckpoint, the same discipline as the traversal BFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import query

DAMPING = 0.85

# Node-keyed frames (ranks, degrees, labels, per-sweep contributions)
# above this row count lose their broadcast hint and the sweeps fall
# back to shuffle joins — the counted-guard class shared with
# traversal._BROADCAST_FRONTIER_MAX.
_NODE_BROADCAST_MAX = 2_000_000


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    damping: float = DAMPING,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node_id, rank): damped PageRank after `iters` synchronous
    sweeps from the uniform distribution. Parallel edges count once
    (the edge set is distinct-ed, matching the oracle)."""
    n_nodes = nodes.select(node_col).distinct().count()
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    from ..functions.scale import maybe_broadcast

    # checkpointed once: outdeg/base were recomputed (one exchange each)
    # EVERY sweep in the r16 shape (r17, guide §2.4). Lazy — the first
    # sweep's job materializes them.
    outdeg = (
        e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(eager=False)
    )
    base = (
        nodes.select(F.col(node_col).alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = base.withColumn("rank", F.lit(round(1.0 / n_nodes, 10)))
    for _ in range(iters):
        # rank-side frames are node-sized and n_nodes is already
        # counted: broadcast them into every join (guarded), so the
        # EDGE frame — the 100 TB side — is never exchanged per sweep;
        # the only per-sweep exchange left is contrib's partial-agg
        # groupBy(dst) (r17, guide §2.4/§3.1). Past the bound the
        # joins fall back to the r16 shuffle shape.
        with_deg = ranks.join(
            maybe_broadcast(outdeg, _NODE_BROADCAST_MAX, n_rows=n_nodes),
            ranks["node"] == outdeg["src"],
            "left",
        ).select("node", "rank", "deg")
        # dangling mass: nodes with no out-edges spread uniformly. A
        # 1-row aggregate frame broadcast into the rank update — not a
        # driver collect — so each sweep is ONE lazy plan (the only
        # job per sweep is the checkpoint) and the same IEEE double
        # division the oracle's per-sweep CTE performs.
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            (
                F.coalesce(F.sum("rank"), F.lit(0.0)) / F.lit(float(n_nodes))
            ).alias("__dm_per_node")
        )
        spread = with_deg.filter(F.col("deg").isNotNull())
        contrib = (
            e.join(
                maybe_broadcast(spread, _NODE_BROADCAST_MAX, n_rows=n_nodes),
                spread["node"] == e["src"],
            )
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            base.join(
                maybe_broadcast(contrib, _NODE_BROADCAST_MAX, n_rows=n_nodes),
                "node",
                "left",
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("__dm_per_node")),
                    10,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("node").alias(node_col), F.round("rank", 6).alias("rank")
    )


def pagerank_sql(
    nodes_cte: str,
    edges_cte: str,
    iters: int = 5,
    damping: float = DAMPING,
) -> str:
    """Chained-CTE DuckDB twin: r0 = uniform, r{k+1} from r{k} with the
    same per-sweep 10 dp rounding. `nodes_cte`/`edges_cte` are CTE
    NAMES already defined in the caller's WITH prefix, exposing
    (node_id) and (src, dst)."""
    parts = [
        f"__n AS (SELECT count(DISTINCT node_id) AS n FROM {nodes_cte})",
        f"__e AS (SELECT DISTINCT src, dst FROM {edges_cte})",
        "__deg AS (SELECT src, count(*) AS deg FROM __e GROUP BY src)",
        f"r0 AS (SELECT DISTINCT node_id AS node, round(1.0 / (SELECT n FROM __n), 10) AS rank FROM {nodes_cte})",
    ]
    for k in range(iters):
        parts.append(f"""d{k} AS (
  SELECT coalesce(sum(r.rank), 0) AS dm FROM r{k} r
  LEFT JOIN __deg g ON g.src = r.node WHERE g.src IS NULL
)""")
        parts.append(f"""c{k} AS (
  SELECT e.dst AS node, sum(r.rank / g.deg) AS inflow
  FROM r{k} r JOIN __deg g ON g.src = r.node JOIN __e e ON e.src = r.node
  GROUP BY e.dst
)""")
        parts.append(f"""r{k + 1} AS (
  SELECT b.node,
         round((1.0 - {damping}) / (SELECT n FROM __n)
               + {damping} * (coalesce(c.inflow, 0)
                              + (SELECT dm FROM d{k}) / (SELECT n FROM __n)), 10) AS rank
  FROM r0 b LEFT JOIN c{k} c ON c.node = b.node
)""")
    return (
        ",\n".join(parts)
        + f",\n__pr AS (SELECT node AS node_id, round(rank, 6) AS rank FROM r{iters})"
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 4,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node_id, community): synchronous LPA after `iters` sweeps.
    Labels start as the node id; each sweep a node takes the most
    frequent neighbor label over the UNDIRECTED distinct edge set,
    ties to the smallest label; isolated nodes keep their own."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    from ..functions.scale import maybe_broadcast

    labels = (
        nodes.select(F.col(node_col).alias("node"), F.col(node_col).alias("lbl"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # one count up front sizes EVERY per-sweep broadcast guard (the
    # label frame stays node-sized by construction) — r17, guide §3.1:
    # the edge frame is never exchanged per sweep under the bound
    n_labels = labels.count()
    for _ in range(iters):
        neigh = (
            und.join(
                maybe_broadcast(labels, _NODE_BROADCAST_MAX, n_rows=n_labels),
                und["b"] == labels["node"],
            )
            .select(F.col("a").alias("node"), "lbl")
            .groupBy("node", "lbl")
            .agg(F.count("*").alias("n"))
        )
        best = (
            neigh.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("n")).alias("negn"), F.col("lbl").alias("lbl")
                    )
                ).alias("top")
            )
            .select("node", F.col("top.lbl").alias("new_lbl"))
        )
        labels = (
            labels.join(
                maybe_broadcast(best, _NODE_BROADCAST_MAX, n_rows=n_labels),
                "node",
                "left",
            )
            .select(
                "node", F.coalesce("new_lbl", "lbl").alias("lbl")
            )
            # lazy: the next sweep's broadcast build (or the caller's
            # action on the last sweep) materializes it (r17)
            .localCheckpoint(eager=False)
        )
    return labels.select(
        F.col("node").alias(node_col), F.col("lbl").alias("community")
    )


def label_propagation_sql(
    nodes_cte: str, edges_cte: str, iters: int = 4
) -> str:
    """Chained-CTE DuckDB twin of `label_propagation` — integer/string
    arithmetic only, exact parity."""
    parts = [
        f"""__u AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM {edges_cte}
    UNION ALL SELECT dst, src FROM {edges_cte}
  )
)""",
        f"l0 AS (SELECT DISTINCT node_id AS node, node_id AS lbl FROM {nodes_cte})",
    ]
    for k in range(iters):
        parts.append(f"""b{k} AS (
  SELECT node, lbl AS new_lbl FROM (
    SELECT u.a AS node, l.lbl,
           row_number() OVER (
             PARTITION BY u.a ORDER BY count(*) DESC, l.lbl
           ) AS rn
    FROM __u u JOIN l{k} l ON l.node = u.b
    GROUP BY u.a, l.lbl
  ) WHERE rn = 1
)""")
        parts.append(f"""l{k + 1} AS (
  SELECT l.node, coalesce(b.new_lbl, l.lbl) AS lbl
  FROM l{k} l LEFT JOIN b{k} b ON b.node = l.node
)""")
    return (
        ",\n".join(parts)
        + f",\n__lpa AS (SELECT node AS node_id, lbl AS community FROM l{iters})"
    )


# Prepared r8 registry candidates: compact aggregates over both
# algorithms so the driver rows stay small while every rank/community
# value feeds the hash.
def g_pagerank(spark, sf_dir: str) -> DataFrame:
    """Top-15 nodes by 5-sweep PageRank (label attached)."""
    from ..registry import Ctx

    ctx = Ctx.get(spark, sf_dir)
    pr = pagerank(ctx.nodes, ctx.edges, iters=5)
    return (
        pr.join(ctx.nodes.select("node_id", "label"), "node_id")
        .orderBy(F.col("rank").desc(), F.col("node_id"))
        .limit(15)
    )


def g_pagerank_oracle() -> str:
    from ..sources.graph_view import graph_ctes

    return (
        graph_ctes(pagerank_sql("nodes", "edges", iters=5))
        + """
SELECT p.node_id, p.rank, n.label
FROM __pr p JOIN nodes n ON n.node_id = p.node_id
ORDER BY p.rank DESC, p.node_id LIMIT 15
"""
    )


def g_communities(spark, sf_dir: str) -> DataFrame:
    """Community-size histogram after 4 LPA sweeps."""
    from ..registry import Ctx

    ctx = Ctx.get(spark, sf_dir)
    lpa = label_propagation(ctx.nodes, ctx.edges, iters=4)
    return (
        lpa.groupBy("community")
        .agg(F.count("*").alias("size"))
        .groupBy("size")
        .agg(F.count("*").alias("n_communities"))
    )


def g_communities_oracle() -> str:
    from ..sources.graph_view import graph_ctes

    return (
        graph_ctes(label_propagation_sql("nodes", "edges", iters=4))
        + """
SELECT size, CAST(count(*) AS BIGINT) AS n_communities FROM (
  SELECT community, count(*) AS size FROM __lpa GROUP BY community
) GROUP BY size
"""
    )


# ---------------------------------------------------------------------------
# Weighted shortest paths: k-sweep Bellman-Ford (the bounded-sweep form,
# same fixed-iteration discipline as pagerank/label_propagation above).
# Edge cost derives from confidence: cost = round(1 - coalesce(conf,
# 0.5), 6) — low-confidence edges are "longer", the graph-distance
# reading of the reference's confidence-weighted traversals.
# ---------------------------------------------------------------------------


def weighted_distances(
    edges: DataFrame,
    sources: list[str],
    sweeps: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    cost: Column | None = None,
) -> DataFrame:
    """(node_id, dist): minimal path cost from the source set within
    `sweeps` relaxation rounds (paths of <= sweeps hops). Per sweep:
    one join of the distance frame to the edge frame + a min
    aggregation by destination — the min-plus twin of the PageRank
    sweep, with the same per-sweep 10 dp rounding so engine min/sum
    ordering cannot drift the parity."""
    c = (
        cost
        if cost is not None
        else F.round(1.0 - F.coalesce(F.col("confidence"), F.lit(0.5)), 6)
    )
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d"), c.alias("__c")
    ).groupBy("__s", "__d").agg(F.min("__c").alias("__c")).localCheckpoint(eager=True)
    from ..functions.scale import local_df, maybe_broadcast

    spark = edges.sparkSession
    dist = local_df(spark, [(s, 0.0) for s in sources], "node_id string, dist double")
    n_dist = len(sources)
    for _ in range(sweeps):
        # the distance frame is reach-sized and counted (the count
        # doubles as the lazy checkpoint's materializing job): under
        # the bound it broadcasts, so the EDGE frame is never exchanged
        # per sweep (r17, guide §2.4/§3.1 — the pagerank discipline)
        relaxed = (
            maybe_broadcast(dist, _NODE_BROADCAST_MAX, n_rows=n_dist)
            .join(e, dist["node_id"] == e["__s"])
            .select(F.col("__d").alias("node_id"), F.round(F.col("dist") + F.col("__c"), 10).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node_id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        n_dist = dist.count()
    return dist.select("node_id", F.round("dist", 6).alias("dist"))


def weighted_distances_sql(
    edges_cte: str, sources_sql: str, sweeps: int = 4
) -> str:
    """Chained-CTE DuckDB twin (CTE body list; final view __wd).
    `sources_sql` is a SELECT producing node_id — deriving the source
    set in SQL keeps the oracle a static string even when the sources
    come from the data."""
    parts = [
        f"""__we AS (
  SELECT src AS s, dst AS d, min(round(1.0 - coalesce(confidence, 0.5), 6)) AS c
  FROM {edges_cte} GROUP BY src, dst
)""",
        f"w0 AS (SELECT node_id, CAST(0.0 AS DOUBLE) AS dist FROM ({sources_sql}))",
    ]
    for k in range(sweeps):
        parts.append(f"""w{k + 1} AS (
  SELECT node_id, min(dist) AS dist FROM (
    SELECT node_id, dist FROM w{k}
    UNION ALL
    SELECT e.d AS node_id, round(w.dist + e.c, 10) AS dist
    FROM w{k} w JOIN __we e ON e.s = w.node_id
  ) GROUP BY node_id
)""")
    return (
        ",\n".join(parts)
        + f",\n__wd AS (SELECT node_id, round(dist, 6) AS dist FROM w{sweeps})"
    )


# Prepared r8 registry candidate: confidence-cost distances from every
# BUILDING-segment customer, 4 sweeps, nearest-25 frontier.
def g_weighted_sssp(spark, sf_dir: str) -> DataFrame:
    from ..registry import Ctx

    ctx = Ctx.get(spark, sf_dir)
    # bounded, deterministic source set — the SAME rule the oracle's
    # _SSSP_SOURCES_SQL applies (lexicographic first-20)
    srcs = [
        r["node_id"]
        for r in ctx.nodes.filter(
            (F.col("label") == "Customer") & (F.col("ontology") == "BUILDING")
        )
        .select("node_id")
        .orderBy("node_id")
        .limit(20)
        .collect()
    ]
    out = weighted_distances(ctx.edges, srcs, sweeps=4)
    return (
        out.join(ctx.nodes.select("node_id", "label"), "node_id")
        .orderBy(F.col("dist").asc(), F.col("node_id"))
        .limit(25)
    )


_SSSP_SOURCES_SQL = (
    "SELECT node_id FROM nodes WHERE label = 'Customer' "
    "AND ontology = 'BUILDING' ORDER BY node_id LIMIT 20"
)


def g_weighted_sssp_oracle() -> str:
    from ..sources.graph_view import graph_ctes

    return (
        graph_ctes(weighted_distances_sql("edges", _SSSP_SOURCES_SQL, sweeps=4))
        + """
SELECT w.node_id, w.dist, n.label
FROM __wd w JOIN nodes n ON n.node_id = w.node_id
ORDER BY w.dist ASC, w.node_id LIMIT 25
"""
    )


# r8 driver row(s): prepared in r7, registered this round (prepared-plan
# discipline — registration only; candidate code and oracles unchanged).
query("g_pagerank", oracle=g_pagerank_oracle())(g_pagerank)
query("g_communities", oracle=g_communities_oracle())(g_communities)
query("g_weighted_sssp", oracle=g_weighted_sssp_oracle())(g_weighted_sssp)


# ---------------------------------------------------------------------------
# Triangle counting + local clustering coefficient (r13 candidate).
#
# The classic distributed formulation (Schank & Wagner 2005; Cohen 2009
# "Graph Twiddling in a MapReduce World" — public literature):
# orient every undirected edge from its lower-(degree, id) endpoint to
# the higher one. Every vertex's OUT-degree in the oriented graph is
# O(sqrt(m)), so enumerating 2-paths (pairs of out-neighbors) costs
# sum(outdeg^2) = O(m^1.5) total — never the naive sum(deg^2), which a
# single 100M-degree hub would blow up. A 2-path u->v, u->w (with
# (deg,id)(v) < (deg,id)(w)) closes into a triangle iff the oriented
# edge v->w exists, and every triangle is found EXACTLY once.
#
# Shuffle shape: undirect+distinct (1 exchange), degree agg (1), two
# node-key joins to attach endpoint degrees, the 2-path self-join
# (shuffled on u), and the closure join (shuffled on the (v, w) pair)
# — all equi-joins on graph keys, no broadcast of any O(V)/O(m) frame.
# Determinism: tuple comparisons on (degree, node_id) — BIGINT +
# string, identical ordering semantics in Spark and DuckDB.
# ---------------------------------------------------------------------------


def triangles(edges: DataFrame) -> DataFrame:
    """(node_id, n_triangles): per-vertex triangle participation over
    the UNDIRECTED simple graph (parallel edges and self-loops
    dropped). Each triangle counts once for each of its 3 vertices."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=True)
    )
    # orientation: u -> v iff (deg(u), u) < (deg(v), v); carry the
    # out-endpoint's (degree, id) for the canonical 2-path pair order
    e = (
        und.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    low_first = F.struct("da", "a") < F.struct("db", "b")
    o = e.select(
        F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(low_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)
    x, y = o.alias("x"), o.alias("y")
    paths = (
        x.join(y, F.col("x.u") == F.col("y.u"))
        .filter(
            F.struct(F.col("x.dv"), F.col("x.v")) < F.struct(F.col("y.dv"), F.col("y.v"))
        )
        .select(
            F.col("x.u").alias("u"), F.col("x.v").alias("v"), F.col("y.v").alias("w")
        )
    )
    tri = paths.join(
        o.select(F.col("u").alias("v"), F.col("v").alias("w")), ["v", "w"]
    )
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count("*").alias("n_triangles"))
    )


# Library surface only: the corpus graph is STRICTLY LAYERED (C-O,
# O-P, P-S edge kinds and nothing else — proven by
# tests/test_triangles.py::test_triangles_match_reference_on_corpus,
# which pins the count at exactly zero), so a graded triangle row
# would hash an all-zero column. The graded motif for THIS graph is
# the bipartite butterfly below.


# ---------------------------------------------------------------------------
# Butterfly (2x2 biclique) counting — the bipartite analog of triangle
# counting (Sanei-Mehri, Sariyuce & Tirthapura 2018, "Butterfly
# Counting in Bipartite Networks" — public literature) and the r13
# candidate motif row. A butterfly is two left-vertices sharing two
# right-vertices: the densest co-occurrence primitive a layered graph
# has (here: order pairs sharing >= 2 parts — co-purchase density).
#
# Count: wedges pivot on the RIGHT side (for each part p, all order
# pairs o1 < o2 containing it), then per-pair shared-neighbor counts c
# give C(c, 2) butterflies. Wedge volume is sum_p C(d_p, 2) — pivot on
# the side whose max degree is smaller (here parts: ~3 orders/part vs
# ~4 parts/order); the pair groupBy key (o1, o2) is the shuffle key,
# so AQE's skew split handles hot pairs downstream.
#
# HUB GUARD (r13, closing VERDICT r12 wrong #3): the wedge SELF-JOIN
# key is the right-vertex, so one hub part with degree d lands all
# C(d, 2) of its wedge rows on a single task — salting is the fix,
# exactly like the x2 skew-join family. Edges are split by measured
# right-degree: the cold side (every dst with d <= _HUB_DEGREE) keeps
# the plain self-join, the hot side goes through functions/skew.py's
# salted_join (left rows salted by row hash, right replicated
# _WEDGE_SALTS x), so a hub key's d^2 pair work spreads across
# _WEDGE_SALTS tasks instead of one. The pair MULTISET is identical
# either way (each (x, y) row pair matches at exactly one salt), so
# counts — and the DuckDB oracle — are unchanged by construction
# (tests/test_triangles.py pins hub arithmetic and the salted plan
# shape). When no dst exceeds the threshold (both gate SFs: max part
# degree ~3 at sf0.01) the split short-circuits and the plan is the
# r12-probed single self-join; the hot-key frame is bounded by
# sum(d) / threshold = m / _HUB_DEGREE rows and rides the counted
# maybe_broadcast guard, never a forced hint.
# ---------------------------------------------------------------------------

# Right-vertex degree above which a key's wedge fan-out is salted:
# C(1024, 2) ~ 0.5M wedge rows is the most one cold task emits for one
# key — the same order as a shuffle partition's row budget.
_HUB_DEGREE = 1024
_WEDGE_SALTS = 32
# hot-key frame broadcast bound (one id per row — the frontier class)
_HUB_BROADCAST_MAX = 2_000_000


def _wedge_pairs(left: DataFrame, right: DataFrame) -> DataFrame:
    """All (o1 < o2) left-vertex pairs sharing a right-vertex, one row
    per shared right-vertex: the plain wedge self-join."""
    x, y = left.alias("x"), right.alias("y")
    return (
        x.join(y, F.col("x.dst") == F.col("y.dst"))
        .filter(F.col("x.src") < F.col("y.src"))
        .select(F.col("x.src").alias("o1"), F.col("y.src").alias("o2"))
    )


def butterflies(
    edges: DataFrame,
    hub_threshold: int = _HUB_DEGREE,
    n_salts: int = _WEDGE_SALTS,
) -> DataFrame:
    """(o1, o2, shared, n_butterflies) per left-vertex pair with
    shared >= 2: C(shared, 2) butterflies each. `edges` is ONE
    bipartite layer as (src=left, dst=right); parallel edges dropped.
    Hub right-vertices (degree > hub_threshold) take a salted wedge
    join; counts are independent of the threshold."""
    from ..functions.scale import maybe_broadcast
    from ..functions.skew import salted_join

    op = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    hot = (
        op.groupBy("dst")
        .agg(F.count("*").alias("__d"))
        .filter(F.col("__d") > hub_threshold)
        .select("dst")
        .localCheckpoint(eager=True)
    )
    n_hot = hot.count()
    if n_hot == 0:
        wedges = _wedge_pairs(op, op)
    else:
        flagged = op.join(
            maybe_broadcast(
                hot.withColumn("__hot", F.lit(True)), _HUB_BROADCAST_MAX,
                n_rows=n_hot,
            ),
            "dst",
            "left",
        ).localCheckpoint(eager=True)
        cold = flagged.filter(F.col("__hot").isNull()).select("src", "dst")
        hub = flagged.filter(F.col("__hot").isNotNull()).select("src", "dst")
        salted = salted_join(
            hub.select(F.col("src").alias("o1"), "dst"),
            hub.select(F.col("src").alias("o2"), "dst"),
            "dst",
            n_salts=n_salts,
        ).filter(F.col("o1") < F.col("o2")).select("o1", "o2")
        wedges = _wedge_pairs(cold, cold).unionByName(salted)
    return (
        wedges.groupBy("o1", "o2")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
        .withColumn(
            "n_butterflies",
            F.expr("CAST(shared * (shared - 1) div 2 AS BIGINT)"),
        )
    )


def g_butterflies(spark, sf_dir: str) -> DataFrame:
    """r13 candidate: top-20 orders by butterfly participation over the
    order-part containment layer (rel_type L*), with the order's part
    degree — the co-purchase density ranking. Ties break on node_id."""
    from ..registry import Ctx

    ctx = Ctx.get(spark, sf_dir)
    layer = ctx.edges.filter(F.col("rel_type").startswith("L"))
    bf = butterflies(layer)
    per_order = (
        bf.select(F.explode(F.array("o1", "o2")).alias("node_id"), "n_butterflies")
        .groupBy("node_id")
        .agg(F.sum("n_butterflies").alias("n_butterflies"))
    )
    deg = (
        layer.select("src", "dst")
        .distinct()
        .groupBy(F.col("src").alias("node_id"))
        .agg(F.count("*").alias("degree"))
    )
    return (
        per_order.join(deg, "node_id")
        .join(ctx.nodes.select("node_id", "label"), "node_id")
        .orderBy(F.col("n_butterflies").desc(), F.col("node_id"))
        .limit(20)
        .select("node_id", "label", "n_butterflies", "degree")
    )


def g_butterflies_oracle() -> str:
    from ..sources.graph_view import graph_ctes

    return graph_ctes(
        """op AS (
  SELECT DISTINCT src, dst FROM edges WHERE rel_type LIKE 'L%'
)""",
        """bf AS (
  SELECT o1, o2, count(*) AS shared,
         CAST((count(*) * (count(*) - 1)) // 2 AS BIGINT) AS n_butterflies
  FROM (
    SELECT x.src AS o1, y.src AS o2
    FROM op x JOIN op y ON x.dst = y.dst AND x.src < y.src
  ) GROUP BY o1, o2 HAVING count(*) >= 2
)""",
        """po AS (
  SELECT node_id, CAST(sum(n_butterflies) AS BIGINT) AS n_butterflies FROM (
    SELECT o1 AS node_id, n_butterflies FROM bf
    UNION ALL SELECT o2, n_butterflies FROM bf
  ) GROUP BY node_id
)""",
        """dg AS (
  SELECT src AS node_id, count(*) AS degree FROM op GROUP BY src
)""",
    ) + """
SELECT po.node_id, n.label, po.n_butterflies, CAST(dg.degree AS BIGINT) AS degree
FROM po JOIN dg USING (node_id) JOIN nodes n USING (node_id)
ORDER BY po.n_butterflies DESC, po.node_id LIMIT 20
"""


# Registered r13: the prepared-candidate plan in registry.py, executed
# (probed r12 SCALE_NOTES part 5; both pre-registration conditions
# closed first — the hub-part salt guard above + the quiet-block
# decade re-probe, SCALE_NOTES r13).
query("g_butterflies", oracle=g_butterflies_oracle())(g_butterflies)
