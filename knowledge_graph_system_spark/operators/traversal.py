"""Graph traversal operators (SURVEY.md §2.6, G1–G5 + A1 degrees).

Reference semantics being reproduced (NOT the implementation):
- G1 BFS neighborhood: visited-set min-distance BFS with direction
  filter (out/in/both) and a confidence filter where NULL/NaN PASSES
  (`/root/reference/graph-accel/core/src/traversal.rs:97-197`).
- G2 shortest path, G3 k-shortest (Yen's-equivalent results via
  deterministic bounded path enumeration), G4 subgraph extraction
  (`traversal.rs:207-551`), A1 degree centrality (`traversal.rs:552-581`).

Spark-first design: the reference needed a Rust in-memory accelerator
because Postgres/AGE traversal is row-at-a-time (92 s for depth-5 on a
236-node graph — BASELINE.md). Here traversal is a loop of broadcast
hash joins against a cached columnar edge DataFrame: the frontier is
always the tiny side, so each hop is a map-side join with NO shuffle of
the (potentially 100 TB) edge table; `visited` stays deduplicated per
level. Depth is bounded like the reference bounds it (max_hops ≤ 10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scale import local_df
from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes

# checkpoint cadence: cut lineage so deep traversals don't accumulate
# a mile-long plan (replaces the reference's generation bookkeeping)
_CHECKPOINT_EVERY = 4

# above this frontier size, stop broadcasting and let the planner shuffle:
# a 100 TB graph can saturate a hub-heavy frontier past driver memory
_BROADCAST_FRONTIER_MAX = 2_000_000


def _frontier_side(frontier: DataFrame, n: int | None) -> DataFrame:
    # An UNCOUNTED frame (n is None) takes the SHUFFLE path: broadcasting
    # a frame of unknown size is the defect class the counted guard
    # exists to prevent, so the default must fail safe, not fail open
    # (r18; no call site passes None today — this hardens the contract
    # for future ones).
    return F.broadcast(frontier) if n is not None and n <= _BROADCAST_FRONTIER_MAX else frontier


def directed_edges(
    edges: DataFrame,
    direction: str = "out",
    min_confidence: float | None = None,
    rel_types: list[str] | None = None,
) -> DataFrame:
    """Edge pairs honoring direction + filters. NULL confidence passes
    (reference rule, `traversal.rs:97-103`)."""
    e = edges
    if rel_types is not None:
        e = e.filter(F.col("rel_type").isin(list(rel_types)))
    if min_confidence is not None:
        e = e.filter(
            (F.col("confidence") >= min_confidence) | F.col("confidence").isNull()
        )
    pairs = e.select("src", "dst")
    if direction == "out":
        return pairs
    rev = pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if direction == "in":
        return rev
    if direction == "both":
        return pairs.unionByName(rev)
    raise ValueError(f"direction must be out|in|both, got {direction!r}")


def bfs(
    edges: DataFrame,
    start_ids: list[str],
    max_depth: int,
    direction: str = "out",
    min_confidence: float | None = None,
    rel_types: list[str] | None = None,
    stop_at: str | None = None,
) -> DataFrame:
    """BFS neighborhood ≤ max_depth → (node_id, dist) with min distance.

    Each hop: edges ⋈ broadcast(frontier) → new frontier minus visited.
    The edge table is never shuffled; per-hop cost is one broadcast of
    the frontier id set (bounded like the reference bounds everything).

    (A fully-fused single-plan variant — level_k = adj ⋈ level_{k-1}
    chained without checkpoints, the reference's fixed-chain idea — was
    measured SLOWER at depth 3: without materialization each level
    branch re-derives its predecessors, O(d²) edge scans vs O(d) here.)

    `stop_at` (r18, guide §2.4 — don't compute levels you throw away):
    when set, the wave stops expanding after the level where that node
    first appears (its min distance), so the returned map covers depths
    0..dist(stop_at) instead of 0..max_depth. The target probe is fused
    into the level count's aggregate — no extra job. Used by the
    shortest-path corridor (`setops.path_to`), whose corridor members
    all satisfy dist_fwd ≤ dist(from, to) by definition.
    """
    spark = edges.sparkSession
    adj = directed_edges(edges, direction, min_confidence, rel_types)
    visited = local_df(spark, [(s, 0) for s in start_ids], "node_id string, dist int")
    frontier = visited.select("node_id")
    n_frontier: int | None = len(start_ids)
    n_visited = len(start_ids)
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.join(_frontier_side(frontier.withColumnRenamed("node_id", "src"), n_frontier), "src")
            .select(F.col("dst").alias("node_id"))
            .distinct()
            # visited is counted (running sum of frontier counts): under
            # the bound the anti-join broadcasts instead of the default
            # SortMergeJoin LeftAnti, which exchanged AND sorted both
            # sides every hop (r17, guide §2.4/§3.1)
            .join(
                _frontier_side(visited.select("node_id"), n_visited),
                "node_id",
                "left_anti",
            )
            .withColumn("dist", F.lit(depth).cast("int"))
        )
        if depth == max_depth:
            # the final level feeds no further hop: let it flow lazily
            # into the caller's single action (r17 — the bfs_paths shape)
            visited = visited.unionByName(nxt)
            break
        # LAZY checkpoint + count: ONE job materializes the hop and
        # returns the frontier size (the eager form paid a separate
        # count job per hop). NOT persist(): CacheManager would
        # substitute the cached subtree into the next bench rep's
        # identical plan — cross-run result caching, which the bench
        # methodology forbids.
        nxt = nxt.localCheckpoint(eager=False)
        if stop_at is not None:
            # target probe fused into the materializing count (the
            # shortest_path_length shape) — same single job per level
            stats = nxt.agg(
                F.count(F.lit(1)).alias("n"),
                F.max(F.when(F.col("node_id") == stop_at, 1).otherwise(0)).alias("hit"),
            ).first()
            n_frontier = stats["n"]
            if n_frontier == 0:
                break
            visited = visited.unionByName(nxt)
            if stats["hit"] == 1:
                break
            n_visited += n_frontier
            if depth % _CHECKPOINT_EVERY == 0:
                visited = visited.localCheckpoint(eager=True)
            frontier = nxt.select("node_id")
            continue
        n_frontier = nxt.count()
        if n_frontier == 0:
            break
        n_visited += n_frontier
        visited = visited.unionByName(nxt)
        if depth % _CHECKPOINT_EVERY == 0:
            visited = visited.localCheckpoint(eager=True)
        frontier = nxt.select("node_id")
    return visited


def directed_edges_tagged(
    edges: DataFrame,
    direction: str = "out",
    min_confidence: float | None = None,
    rel_types: list[str] | None = None,
) -> DataFrame:
    """Like `directed_edges` but keeps rel_type and tags each pair with
    the traversal direction ('O' followed forward / 'I' reversed) — the
    reference records this per hop (`traversal.rs:143`)."""
    e = edges
    if rel_types is not None:
        e = e.filter(F.col("rel_type").isin(list(rel_types)))
    if min_confidence is not None:
        e = e.filter(
            (F.col("confidence") >= min_confidence) | F.col("confidence").isNull()
        )
    out = e.select("src", "dst", "rel_type", F.lit("O").alias("dir"))
    if direction == "out":
        return out
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "rel_type", F.lit("I").alias("dir")
    )
    if direction == "in":
        return rev
    if direction == "both":
        return out.unionByName(rev)
    raise ValueError(f"direction must be out|in|both, got {direction!r}")


def bfs_paths(
    edges: DataFrame,
    start_ids: list[str],
    max_depth: int,
    direction: str = "out",
    min_confidence: float | None = None,
    rel_types: list[str] | None = None,
) -> DataFrame:
    """BFS neighborhood with per-node path reconstruction (G1's full
    response shape): (node_id, dist, path_types, path_dirs), where
    path_types is the '>'-joined rel-type sequence of ONE BFS-tree path
    from the start, as the reference returns from parent-pointer
    reconstruction (`graph-accel/core/src/traversal.rs:113-197`).

    The reference's parent choice is HashMap-iteration-order
    (nondeterministic); here the choice is pinned: the path minimizing
    the interleaved [node, rel|dir, node, ...] key under element-wise
    array comparison. Array (not string-concat) comparison makes the
    greedy per-level choice equal the global minimum — a shorter id that
    is a prefix of a longer one ("C1" vs "C10") would invert under
    string concatenation.

    Same scale posture as `bfs`: per-hop broadcast of the frontier, edge
    table never shuffled; the frontier rows now carry O(depth) arrays,
    still bounded by the same frontier cap.
    """
    spark = edges.sparkSession
    adj = directed_edges_tagged(edges, direction, min_confidence, rel_types)
    empty_arr = F.array().cast("array<string>")
    visited = local_df(spark, [(s,) for s in start_ids], "node_id string").select(
        "node_id",
        F.lit(0).cast("int").alias("dist"),
        F.array("node_id").alias("key"),
        empty_arr.alias("ptypes"),
        empty_arr.alias("pdirs"),
    )
    frontier = visited
    n_frontier: int | None = len(start_ids)
    n_visited = len(start_ids)
    for depth in range(1, max_depth + 1):
        cand = (
            adj.join(
                _frontier_side(
                    frontier.select(
                        F.col("node_id").alias("src"), "key", "ptypes", "pdirs"
                    ),
                    n_frontier,
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node_id"),
                F.concat(
                    "key", F.array(F.concat_ws("|", "rel_type", "dir"), F.col("dst"))
                ).alias("key"),
                F.concat("ptypes", F.array("rel_type")).alias("ptypes"),
                F.concat("pdirs", F.array("dir")).alias("pdirs"),
            )
            # counted-broadcast anti-join (r17): replaces a per-level
            # SortMergeJoin LeftAnti that exchanged + sorted the full
            # candidate set AND the visited set (see bfs)
            .join(
                _frontier_side(visited.select("node_id"), n_visited),
                "node_id",
                "left_anti",
            )
        )
        chosen = cand.groupBy("node_id").agg(
            F.min(F.struct("key", "ptypes", "pdirs")).alias("m")
        ).select(
            "node_id",
            F.lit(depth).cast("int").alias("dist"),
            "m.key",
            "m.ptypes",
            "m.pdirs",
        )
        if depth == max_depth:
            # the final level feeds no further hop: let it flow lazily
            # into the caller's single action instead of materializing —
            # one checkpoint job + one count job saved per traversal
            visited = visited.unionByName(chosen)
            break
        # lazy checkpoint + count = ONE materialization job per level
        # (see bfs for why persist() is not an option here)
        chosen = chosen.localCheckpoint(eager=False)
        n_frontier = chosen.count()
        if n_frontier == 0:
            break
        n_visited += n_frontier
        visited = visited.unionByName(chosen)
        if depth % _CHECKPOINT_EVERY == 0:
            visited = visited.localCheckpoint(eager=True)
        frontier = chosen
    return visited.select(
        "node_id",
        "dist",
        F.array_join("ptypes", ">").alias("path_types"),
        F.array_join("pdirs", "").alias("path_dirs"),
    )


def shortest_path_length(
    edges: DataFrame,
    src_id: str,
    dst_id: str,
    max_hops: int = 6,
    direction: str = "out",
) -> DataFrame:
    """Unweighted shortest-path length (G2) → (src, dst, dist) or empty.

    Forward BFS with early exit on meet; the reference's own Python
    fallback is bidirectional BFS (`graph_facade.py:553-762`) — forward
    is sufficient here because depth is bounded ≤ 10 and each hop is a
    broadcast join, not a DB round-trip.
    """
    spark = edges.sparkSession
    if src_id == dst_id:
        # the start node is reachable at distance 0 (reference BFS rule)
        return local_df(spark, [(src_id, dst_id, 0)], "src string, dst string, dist int")
    found = None
    adj = directed_edges(edges, direction)
    visited = local_df(spark, [(src_id, 0)], "node_id string, dist int")
    frontier = visited.select("node_id")
    # per-hop frontier is O(V) worst case (hub graphs) — counted guard,
    # same policy as bfs's _frontier_side; the count is free (each
    # hop's count() is already paid for the early-exit check)
    n_frontier = 1
    n_visited = 1
    for depth in range(1, max_hops + 1):
        nxt = (
            adj.join(
                _frontier_side(
                    frontier.withColumnRenamed("node_id", "src"), n_frontier
                ),
                "src",
            )
            .select(F.col("dst").alias("node_id"))
            .distinct()
            # counted-broadcast anti-join, as in bfs (r17)
            .join(
                _frontier_side(visited.select("node_id"), n_visited),
                "node_id",
                "left_anti",
            )
            .localCheckpoint(eager=False)
        )
        # ONE job: materializes the lazy checkpoint and returns frontier
        # size + target-hit flag (was three jobs: eager checkpoint,
        # count, filter-count — r17, guide §1/§2.4)
        stats = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("node_id") == dst_id, 1).otherwise(0)).alias("hit"),
        ).first()
        n_frontier = stats["n"]
        if n_frontier == 0:
            break
        if stats["hit"] == 1:
            found = depth
            break
        n_visited += n_frontier
        visited = visited.unionByName(nxt.withColumn("dist", F.lit(depth).cast("int")))
        frontier = nxt
    rows = [(src_id, dst_id, found)] if found is not None else []
    return local_df(spark, rows, "src string, dst string, dist int")


def shortest_path(
    edges: DataFrame,
    src_id: str,
    dst_id: str,
    max_hops: int = 6,
    direction: str = "out",
) -> list[str]:
    """G2 with path reconstruction: BFS recording parent pointers, then a
    driver-side walk back over the (tiny) parent maps — the exact shape
    of the reference's Rust reconstruction (`traversal.rs:207-305`) with
    the per-level parent tables staying distributed until the end."""
    if src_id == dst_id:
        return [src_id]
    spark = edges.sparkSession
    adj = directed_edges(edges, direction)
    visited = local_df(spark, [(src_id,)], "node_id string")
    frontier = visited
    n_frontier = 1  # counted frontier guard, as in shortest_path_length
    n_visited = 1
    levels: list[DataFrame] = []  # checkpointed (node_id, parent) per depth
    for _ in range(max_hops):
        step = (
            adj.join(
                _frontier_side(
                    frontier.withColumnRenamed("node_id", "src"), n_frontier
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.min("src").alias("parent"))  # deterministic parent choice
            # counted-broadcast anti-join, as in bfs (r17)
            .join(_frontier_side(visited, n_visited), "node_id", "left_anti")
            .localCheckpoint(eager=False)
        )
        # ONE job materializes + counts + probes the target (r17)
        stats = step.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("node_id") == dst_id, 1).otherwise(0)).alias("hit"),
        ).first()
        n_frontier = stats["n"]
        if n_frontier == 0:
            return []
        n_visited += n_frontier
        levels.append(step)
        if stats["hit"] == 1:
            # walk back through the per-level parent tables: one 1-row
            # lookup per depth — the tables themselves stay distributed
            path = [dst_id]
            for level in reversed(levels):
                row = level.filter(F.col("node_id") == path[-1]).take(1)
                if not row:
                    break
                path.append(row[0]["parent"])
            return list(reversed(path))
        frontier = step.select("node_id")
        # no per-level eager checkpoint of visited: it is a union of
        # already-checkpointed level frames (shallow lineage), so the
        # checkpoint job per level bought nothing (r17)
        visited = visited.unionByName(frontier)
    return []


_PATH_BEAM_CAP = 10_000


def enumerate_paths(
    edges: DataFrame,
    src_id: str,
    dst_id: str,
    max_hops: int = 4,
    k: int | None = None,
    direction: str = "out",
    per_level_cap: int = _PATH_BEAM_CAP,
    level_counts: list[int] | None = None,
) -> DataFrame:
    """Simple paths src→dst ≤ max_hops as (path, hops), optionally top-k
    by (hops, path) — deterministic k-shortest-paths semantics (G3).
    The reference's Yen's algorithm returns the same result set for
    unweighted graphs with dedup-by-node-sequence (`traversal.rs:306-487`);
    `yen_k_shortest` below is the literal form.

    Scale guard: the alive frontier is BEAM-CAPPED per level at the
    lexicographically smallest `per_level_cap` paths (element-wise array
    order — prefix-stable, so the kept prefixes are exactly the ones the
    smallest full paths extend). On a hub-heavy graph uncapped per-level
    growth is exponential; with the cap each level is a TakeOrdered of at
    most cap rows. Exact whenever no level hits the cap (every fixture
    level is <300 rows; `level_counts` instrumentation + plan test pin
    this), best-effort beam beyond it — the same bounded-everything
    policy the reference applies (K ≤ 5, hops ≤ 10).
    """
    adj = directed_edges(edges, direction).select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    )
    spark = edges.sparkSession
    paths = local_df(spark, [(src_id, [src_id], 0)], "head string, path array<string>, hops int")
    done = paths.filter(F.lit(False))
    n_paths = 1  # each level's count is already paid for the empty check
    for _ in range(max_hops):
        alive = paths.filter(F.col("head") != dst_id)
        if n_paths > per_level_cap:
            # beam truncation only bites past the cap; below it the
            # sort+limit is the identity — skip the global TakeOrdered
            # job the r16 shape paid on every level (guide §2.4: an
            # orderBy used only to make output deterministic, removed
            # where the result is provably the full set)
            alive = alive.orderBy("path").limit(per_level_cap)
        step = (
            adj.join(F.broadcast(alive.withColumnRenamed("head", "_s")), "_s")
            .filter(~F.array_contains(F.col("path"), F.col("_d")))
            .select(
                F.col("_d").alias("head"),
                F.concat(F.col("path"), F.array(F.col("_d"))).alias("path"),
                (F.col("hops") + 1).alias("hops"),
            )
            .distinct()
            # lazy checkpoint: the count below materializes it in the
            # same job (r17 — was eager + count, two jobs per level)
            .localCheckpoint(eager=False)
        )
        n_step = step.count()
        if level_counts is not None:
            level_counts.append(n_step)
        if n_step == 0:
            break
        done = done.unionByName(step.filter(F.col("head") == dst_id))
        paths = step
        n_paths = n_step
    out = done.select(
        F.array_join("path", ">").alias("path"), F.col("hops").cast("int").alias("hops")
    ).distinct()
    if k is not None:
        out = out.orderBy("hops", "path").limit(k)
    return out


def yen_k_shortest(
    edges: DataFrame,
    src_id: str,
    dst_id: str,
    k: int = 5,
    max_hops: int = 6,
    direction: str = "out",
) -> list[list[str]]:
    """G3 as the reference actually implements it: Yen's algorithm —
    spur-node deviation with edge+node exclusion, dedup by node sequence
    (`/root/reference/graph-accel/core/src/traversal.rs:306-487`).
    Exclusions are anti-join filters on the edge DataFrame; each spur
    search is a bounded BFS (K ≤ 5, hops ≤ 10 like the reference).
    `enumerate_paths(k=...)` returns the same result set for unweighted
    graphs (asserted in tests); this form exists for semantic parity and
    for graphs where exhaustive enumeration would explode.
    """
    first = shortest_path(edges, src_id, dst_id, max_hops, direction)
    if not first:
        return []
    accepted: list[list[str]] = [first]
    candidates: list[list[str]] = []
    for _ in range(1, k):
        prev = accepted[-1]
        for i in range(len(prev) - 1):
            spur, root = prev[i], prev[: i + 1]
            # exclude edges that previous accepted paths take out of this root
            banned_edges = [
                (p[i], p[i + 1]) for p in accepted if len(p) > i + 1 and p[: i + 1] == root
            ]
            cond = F.lit(False)
            for a, b in banned_edges:
                cond = cond | ((F.col("src") == a) & (F.col("dst") == b))
            filtered = edges.filter(~cond)
            # exclude root nodes except the spur itself (no loops back)
            for node in root[:-1]:
                filtered = filtered.filter(
                    (F.col("src") != node) & (F.col("dst") != node)
                )
            spur_path = shortest_path(
                filtered, spur, dst_id, max_hops - i, direction
            )
            if spur_path:
                cand = root[:-1] + spur_path
                if cand not in accepted and cand not in candidates:
                    candidates.append(cand)
        if not candidates:
            break
        candidates.sort(key=lambda p: (len(p), p))
        accepted.append(candidates.pop(0))
    return accepted


def subgraph(edges: DataFrame, node_set: DataFrame) -> DataFrame:
    """Edges whose BOTH endpoints are in node_set (G4) — double
    semi-join; node_set hinted into both joins WHILE COUNTED (r11
    sweep: node sets from BFS are O(reach), the frontier defect class),
    edge table untouched by shuffle under the bound. One count serves
    both hints (BFS outputs arrive checkpointed)."""
    # lazy checkpoint + count: one materialization job (r17)
    ids = node_set.select("node_id").localCheckpoint(eager=False)
    n_ids = ids.count()
    return (
        edges.join(
            _frontier_side(ids.withColumnRenamed("node_id", "src"), n_ids),
            "src",
            "left_semi",
        ).join(
            _frontier_side(ids.withColumnRenamed("node_id", "dst"), n_ids),
            "dst",
            "left_semi",
        )
    ).select("src", "dst", "rel_type", "confidence")


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node out/in/total degree (A1). Two partial-aggregated counts +
    one outer join; at scale this is the textbook map-side-combine plan."""
    out_d = edges.groupBy(F.col("src").alias("node_id")).agg(F.count("*").alias("out_degree"))
    in_d = edges.groupBy(F.col("dst").alias("node_id")).agg(F.count("*").alias("in_degree"))
    return (
        out_d.join(in_d, "node_id", "full_outer")
        .select(
            "node_id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("total_degree", F.col("out_degree") + F.col("in_degree"))
    )


# ---------------------------------------------------------------------------
# Registered queries + DuckDB (recursive CTE) oracles
# ---------------------------------------------------------------------------

_START = "C1"


def _walk_cte(start: str, depth: int, edge_src: str = "edges") -> str:
    """DuckDB recursive-CTE twin of `bfs`: UNION dedups, min(dist) = BFS."""
    return f"""
walk(node_id, dist) AS (
  SELECT '{start}', 0
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN {edge_src} e ON e.src = w.node_id
  WHERE w.dist < {depth}
)"""


def _paths_cte(start: str, depth: int, edge_src: str = "dedges") -> str:
    """DuckDB twin of `bfs_paths`: enumerate BFS-tree paths (every node
    entered at its min distance), pick the min interleaved key per node.
    `edge_src` must provide (src, dst, rel_type, dir)."""
    return f"""
walk(node_id, dist) AS (
  SELECT '{start}', 0
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN {edge_src} e ON e.src = w.node_id
  WHERE w.dist < {depth}
),
mindist AS (SELECT node_id, min(dist) AS dist FROM walk GROUP BY node_id),
paths(node_id, key, ptypes, pdirs, hops) AS (
  SELECT '{start}', ['{start}'], CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[]), 0
  UNION ALL
  SELECT e.dst, p.key || [e.rel_type || '|' || e.dir, e.dst],
         p.ptypes || [e.rel_type], p.pdirs || [e.dir], p.hops + 1
  FROM paths p
  JOIN {edge_src} e ON e.src = p.node_id
  JOIN mindist dn ON dn.node_id = e.dst AND dn.dist = p.hops + 1
  WHERE p.hops < {depth}
),
chosen AS (
  SELECT node_id, CAST(hops AS INT) AS dist,
         array_to_string(ptypes, '>') AS path_types,
         array_to_string(pdirs, '') AS path_dirs
  FROM (
    SELECT node_id, hops, ptypes, pdirs,
           row_number() OVER (PARTITION BY node_id ORDER BY key) AS rn
    FROM paths WHERE hops > 0
  ) WHERE rn = 1
  UNION ALL
  SELECT '{start}', 0, '', ''
)"""


@query(
    "g1_bfs_out_depth3",
    oracle=graph_ctes("dedges AS (SELECT src, dst, rel_type, 'O' AS dir FROM edges)")
    + ","
    + _paths_cte(_START, 3)
    + """
SELECT node_id, dist, path_types, path_dirs FROM chosen
""",
)
def g1_bfs_out_depth3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 with the reference's full response shape: distance plus the
    rel-type path and per-hop directions of one (deterministically
    chosen) BFS-tree path per node."""
    ctx = Ctx.get(spark, sf_dir)
    return bfs_paths(ctx.edges, [_START], 3, direction="out")


@query(
    "g1_bfs_both_depth2_conf",
    oracle=graph_ctes(
        """dedges AS (
  SELECT src, dst, rel_type, 'O' AS dir FROM edges
  WHERE confidence >= 0.5 OR confidence IS NULL
  UNION ALL
  SELECT dst, src, rel_type, 'I' AS dir FROM edges
  WHERE confidence >= 0.5 OR confidence IS NULL
)"""
    )
    + ","
    + _paths_cte("S1", 2)
    + """
SELECT node_id, dist, path_types, path_dirs FROM chosen
""",
)
def g1_bfs_both_depth2_conf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected BFS with min-confidence filter (NULL passes), with
    path_types/path_dirs reconstruction."""
    ctx = Ctx.get(spark, sf_dir)
    return bfs_paths(ctx.edges, ["S1"], 2, direction="both", min_confidence=0.5)


@query(
    "g2_shortest_path",
    oracle=graph_ctes()
    + ","
    + _walk_cte(_START, 6)
    + """
SELECT 'C1' AS src, 'S1' AS dst, CAST(min(dist) AS INT) AS dist
FROM walk WHERE node_id = 'S1'
HAVING min(dist) IS NOT NULL
""",
)
def g2_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    return shortest_path_length(ctx.edges, _START, "S1", max_hops=6)


@query(
    "g3_k_shortest_paths",
    oracle=graph_ctes()
    + """,
paths(head, path, hops) AS (
  SELECT 'C1', 'C1', 0
  UNION
  SELECT e.dst, p.path || '>' || e.dst, p.hops + 1
  FROM paths p JOIN edges e ON e.src = p.head
  WHERE p.hops < 4 AND p.head <> 'S1' AND position(e.dst || '>' IN p.path || '>') = 0
)
SELECT path, CAST(hops AS INT) AS hops FROM paths WHERE head = 'S1'
ORDER BY hops, path LIMIT 5
""",
)
def g3_k_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    return enumerate_paths(ctx.edges, _START, "S1", max_hops=4, k=5)


@query(
    "g4_subgraph",
    oracle=graph_ctes()
    + ","
    + _walk_cte(_START, 2)
    + """
, nset AS (SELECT DISTINCT node_id FROM walk)
SELECT e.src, e.dst, e.rel_type, round(e.confidence, 6) AS confidence,
       CAST(count(*) AS BIGINT) AS multiplicity
FROM edges e
JOIN nset a ON a.node_id = e.src
JOIN nset b ON b.node_id = e.dst
GROUP BY e.src, e.dst, e.rel_type, round(e.confidence, 6)
""",
)
def g4_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS node set → induced edge multiset (grouped with multiplicity so
    the comparison is order-insensitive over a multigraph)."""
    ctx = Ctx.get(spark, sf_dir)
    nset = bfs(ctx.edges, [_START], 2, direction="out")
    return (
        subgraph(ctx.edges, nset)
        .groupBy("src", "dst", "rel_type", F.round("confidence", 6).alias("confidence"))
        .agg(F.count("*").alias("multiplicity"))
    )


@query(
    "a1_degree_top20",
    oracle=graph_ctes()
    + """,
outd AS (SELECT src AS node_id, CAST(count(*) AS BIGINT) AS out_degree FROM edges GROUP BY src),
ind  AS (SELECT dst AS node_id, CAST(count(*) AS BIGINT) AS in_degree  FROM edges GROUP BY dst)
SELECT coalesce(outd.node_id, ind.node_id) AS node_id,
       coalesce(out_degree, 0) AS out_degree,
       coalesce(in_degree, 0) AS in_degree,
       coalesce(out_degree, 0) + coalesce(in_degree, 0) AS total_degree
FROM outd FULL OUTER JOIN ind ON outd.node_id = ind.node_id
ORDER BY total_degree DESC, node_id LIMIT 20
""",
)
def a1_degree_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    return degrees(ctx.edges).orderBy(F.col("total_degree").desc(), "node_id").limit(20)
