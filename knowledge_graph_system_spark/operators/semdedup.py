"""SemDeDup — semantic deduplication by within-cluster embedding
similarity (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication").

Completes the dedup family's fourth axis: exact (sha256), lexical
near-dup (MinHash/LSH), span-level (Lee et al. rewrite), and now
SEMANTIC — documents that say the same thing in different words, which
no lexical signal catches. The published recipe, re-expressed as
DataFrame ops:

1. cluster every embedding to its nearest centroid (here the same
   deterministic label-centroid coarse quantizer `operators/ann.py`
   and `operators/dedup.py` use, single assignment — at 100 TB this is
   a write-time column, exactly like the IVF cell);
2. WITHIN each cluster only, find pairs with cosine ≥ τ — candidate
   volume is Σ_c |c|², never corpus²; the cluster key is the shuffle
   key, so skew is bounded by the largest cluster, and a hot cluster
   would salt exactly like the skew-join family;
3. connect pairs into duplicate groups (the same distributed
   pointer-jumping CC `operators/components.py` ships — one shared
   contract for lexical, embedding-IVF, and semantic groups);
4. keep ONE exemplar per group — per the paper, the member with the
   LOWEST cosine to its cluster centroid (keeping low-similarity
   examples preserves diversity near cluster edges); ties break on
   vec_id so the election is total.

Differences from `d_embedding_groups` (the embedding-IVF leg): that
path multi-probes 4 buckets to chase recall for NEAR-duplicate
detection; SemDeDup is single-cluster by construction (the paper's
trade: within-cluster misses are accepted, cross-cluster pairs are
out of contract) and elects by centroid distance, not min-id.

The oracle replays all four stages (centroids, single assignment,
within-cluster pairs, recursive-CC fixpoint, argmin election)
byte-for-byte in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_expr
from ..registry import Ctx, query
from .components import connected_components

# Within-cluster duplicate threshold. The fixture's embeddings are
# deliberately near-orthogonal noise plus planted near-dup pairs, so
# the working band is the same as d_embedding_neardup's (0.4); pairs
# at ≥ τ inside one cluster are the planted semantic clones.
SEMDEDUP_THRESHOLD = 0.4

# Assignment rows above this lose the pair-join broadcast hint (the
# frontier/LM bound class: an id + a label per row).
_ASSIGN_BROADCAST_MAX = 2_000_000


def cluster_assign(vectors: DataFrame) -> DataFrame:
    """(vec_id, clabel, ccos): nearest label-centroid per vector —
    single assignment (SemDeDup's clustering step), plus the cosine to
    the assigned centroid that the keeper election orders on.

    Same centroid build as operators/ann.py: posexplode → per-(label,
    dim) mean → reassemble; centroid frame is ≤ nlist rows and
    broadcast."""
    cdim = (
        vectors.select("label", F.posexplode("v").alias("d", "x"))
        .groupBy("label", "d")
        .agg(F.avg("x").alias("cv"))
    )
    cent = cdim.groupBy(F.col("label").alias("clabel")).agg(
        F.expr("transform(array_sort(collect_list(struct(d, cv))), s -> s.cv)").alias("cv")
    )
    scored = vectors.join(F.broadcast(cent)).withColumn(
        "ccos", F.round(cosine_expr("v", "cv"), 6)
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("clabel"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "clabel", "ccos")
    )


def semdedup_pairs(
    vectors: DataFrame,
    assign: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    assign_rows: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b, cos) — exact cosine ≥ threshold, computed ONLY
    for pairs sharing an assigned cluster (the equi-join key).

    Parallelism shape (r11 candidate decade probe): the self-join
    EXPLODES output Σ|c|²-fold, so its parallelism must come from the
    LEFT side's partitioning, not from AQE's input-byte sizing (the
    assignment frame is megabytes, so AQE coalesces it to ~1 partition
    and the expansion serializes) and not from a clabel shuffle (only
    |clusters| distinct keys → ≤ |clusters| active cores). fan_out the
    left side, broadcast the right WHILE COUNTED — past the bound the
    clabel shuffle is the fallback and AQE's skew split handles the
    hot clusters."""
    from ..functions.scale import fan_out, maybe_broadcast

    a = fan_out(assign.select(F.col("vec_id").alias("vec_a"), "clabel"))
    b = assign.select(F.col("vec_id").alias("vec_b"), "clabel")
    # assign_rows: callers that checkpointed `assign` pass the count so
    # the guard costs nothing extra (ADVICE r11 — without it the guard's
    # count() re-executed the full assignment lineage per invocation,
    # the embedding_candidates_ivf one-checkpoint-one-count pattern)
    cand = a.join(
        maybe_broadcast(b, _ASSIGN_BROADCAST_MAX, n_rows=assign_rows), "clabel"
    ).filter(F.col("vec_a") < F.col("vec_b"))
    va = vectors.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    vb = vectors.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos", F.round(cosine_expr("va", "vb"), 6))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def semdedup_groups(
    vectors: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    assign: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, clabel, group_id, keeper): semantic duplicate groups
    with the paper's exemplar rule — keeper = the group member with
    the LOWEST cosine to its cluster centroid, ties by vec_id.

    SCALE CONTRACT (measured, r11 candidate decade probe): the default
    label quantizer has FIXED cluster count, so Σ_c |c|² grows
    quadratically in corpus size — the probe read 67× wall for 10×
    data before the fan-out fix and stays superlinear after it, which
    is exactly why the paper scales its cluster count WITH the corpus
    (k ∝ N; Abbas et al. run 100k k-means clusters on LAION). At
    production scale pass `assign` — a precomputed (vec_id, clabel,
    ccos) assignment from a real k ∝ N quantizer, written at ingest
    time like the IVF cell column — and the within-cluster pair volume
    stays linear. The default stays label-based because it is a pure
    deterministic function of the table (what the driver-graded row
    must be) and correct at gate scale."""
    if assign is None:
        assign = cluster_assign(vectors)
    # one checkpoint + one count shared between the broadcast guard and
    # the join (a caller-passed production `assign` is checkpointed here
    # too, so the guard never re-executes its lineage — ADVICE r11)
    assign = assign.localCheckpoint(eager=True)
    pairs = semdedup_pairs(
        vectors, assign, threshold, assign_rows=assign.count()
    )
    comp = connected_components(pairs, "vec_a", "vec_b")
    grouped = comp.select(
        F.col("node").alias("vec_id"), F.col("comp").alias("group_id")
    ).join(assign, "vec_id")
    w = Window.partitionBy("group_id").orderBy(F.col("ccos").asc(), F.col("vec_id"))
    return (
        grouped.withColumn("__rn", F.row_number().over(w))
        .select(
            "vec_id",
            "clabel",
            "group_id",
            (F.col("__rn") == 1).alias("keeper"),
        )
    )


def d_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 candidate: SemDeDup groups over the embeddings table —
    (vec_id, clabel, group_id, keeper), composing with `dedup_apply`
    (keyed on vec_id) exactly like the other group resolvers."""
    ctx = Ctx.get(spark, sf_dir)
    # fan_out BEFORE the checkpoint: the single-file scan yields 2
    # splits and the N×nlist assignment stage inherits them (the r11
    # candidate decade probe caught the stage serialized on 2 of 32
    # cores; see semdedup_groups' scale contract for the remaining —
    # inherent — Σ|c|² term)
    from ..functions.scale import fan_out

    vecs = fan_out(
        ctx.tables["embeddings"].select(
            "vec_id",
            "label",
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
    ).localCheckpoint(eager=True)  # feeds assignment + both pair sides
    return semdedup_groups(vecs)


def d_semdedup_oracle() -> str:
    return f"""
WITH RECURSIVE e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
cdim AS (
  SELECT label, d, avg(x) AS cv FROM (
    SELECT label, unnest(range(1, len(v)+1)) AS d, unnest(v) AS x FROM e
  ) GROUP BY label, d
),
cent AS (SELECT label AS clabel, list(cv ORDER BY d) AS cv FROM cdim GROUP BY label),
assign AS (
  SELECT vec_id, clabel, ccos FROM (
    SELECT e.vec_id, c.clabel,
           round(list_dot_product(v, cv)
             / nullif(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)), 0), 6) AS ccos,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             round(list_dot_product(v, cv)
               / nullif(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)), 0), 6) DESC,
             c.clabel) AS rn
    FROM e CROSS JOIN cent c
  ) WHERE rn = 1
),
prs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM assign a JOIN assign b ON a.clabel = b.clabel AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
  WHERE round(list_dot_product(ea.v, eb.v)
        / nullif(sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)), 0), 6)
        >= {SEMDEDUP_THRESHOLD}
),
und AS (SELECT vec_a AS a, vec_b AS b FROM prs
        UNION ALL SELECT vec_b, vec_a FROM prs),
reach(node, comp) AS (
  SELECT DISTINCT a, a FROM und
  UNION
  SELECT u.b, r.comp FROM reach r JOIN und u ON u.a = r.node
),
g AS (
  SELECT CAST(node AS BIGINT) AS vec_id, CAST(min(comp) AS BIGINT) AS group_id
  FROM reach GROUP BY node
)
SELECT g.vec_id, a.clabel, g.group_id,
       row_number() OVER (
         PARTITION BY g.group_id ORDER BY a.ccos ASC, g.vec_id
       ) = 1 AS keeper
FROM g JOIN assign a ON a.vec_id = g.vec_id
"""


# r12 registration (the pre-computed window plan, registry.py): the
# candidate was built + decade-probed in r11 (two scale defects fixed
# pre-registration, SCALE_NOTES r11 part 7) and registers here as one
# of the three r12 new rows — the queue-draining round.
query("d_semdedup", oracle=d_semdedup_oracle())(d_semdedup)
