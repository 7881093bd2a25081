"""Vocabulary pruning / merge strategies (SURVEY.md §2.11 U4).

Reference parity — the full strategy matrix of
`/root/reference/api/app/lib/pruning_strategies.py:241-875`:
- three modes: NAIVE (algorithmic), HITL (human-in-the-loop), AITL
  (AI-in-the-loop) (`:241-246`);
- four actions MERGE/PRUNE/DEPRECATE/SKIP with review levels
  none/ai/human and should_execute/needs_review flags (`:248-288`);
- synonym evaluation by strength tier × mode (`evaluate_synonym`,
  `:331-455`): strong → auto-merge (naive/aitl) or human review (hitl);
  moderate → skip (naive), human review (hitl), LLM review (aitl);
  weak → always skip. Preserve = higher value score, ties to the
  alphabetically-first member (`:365-367`);
- low-value evaluation (`evaluate_low_value_type`, `:457-560`): builtin
  types never pruned; zero-edge types auto-prune (naive/aitl) or human
  review (hitl); low-value-with-edges → skip (naive), deprecate+human
  (hitl), LLM review (aitl).

The reference's AITL reviews call a reasoning LLM grounded in the math
(`_ai_review_synonym:622-748`, falling back to a threshold heuristic
when no LLM is available). This container has no LLM, so the review is
the MOCKED provider (U1 pattern): a deterministic grounded rule —
moderate synonyms merge iff sim ≥ AI_MERGE_T, low-value types deprecate
iff value_score < AI_DEPRECATE_T — which is exactly the reference's
"heuristic fallback" path, and keeps the whole operator oracle-able.

Everything is vocabulary-sized column logic over two broadcast frames;
the only row-scaled work is the per-type edge aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import oracle_snippets as osql
from ..functions.vectors import dot_expr
from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes

# strength tiers (v6's scaled analog of the reference's 0.90/0.70)
STRONG_T = 0.35
MODERATE_T = 0.1
PRUNE_VALUE_T = 1.0
# mocked-LLM grounded thresholds (the reference's heuristic fallback)
AI_MERGE_T = 0.25
AI_DEPRECATE_T = 0.6

_MODES = ("naive", "hitl", "aitl")
# builtin = non-semantic categories (PLACED/SUPPLIED_BY): never pruned
_BUILTIN_CATS = ("provenance", "structural")


def _value_and_counts(ctx: Ctx) -> DataFrame:
    """Per-type value score (A10 formula) + edge count; the one
    row-scaled aggregate, broadcast everywhere below."""
    return ctx.edges.groupBy("rel_type").agg(
        F.count("*").alias("edge_count"),
        F.round(
            F.count("*") / 1000.0
            + F.avg(F.coalesce(F.col("confidence"), F.lit(0.5))) * 0.5
            + F.countDistinct("src") / 10.0 * 0.3,
            6,
        ).alias("value_score"),
    )


def pruning_recommendations(ctx: Ctx, mode: str = "aitl") -> DataFrame:
    """ActionRecommendation rows for every synonym pair and every
    low-value type, per the mode's decision matrix. Columns:
    (action, subject, target, review, auto_execute, score)."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")

    stats = _value_and_counts(ctx)
    v = (
        ctx.vocab.select("rel_type", "category", "embedding")
        .join(F.broadcast(stats), "rel_type", "left")
        .withColumn("edge_count", F.coalesce("edge_count", F.lit(0)))
        .withColumn("value_score", F.coalesce("value_score", F.lit(0.0)))
    )

    # ----- synonym pairs (a < b alphabetically, reference candidate order)
    a = v.select(
        F.col("rel_type").alias("ta"), F.col("embedding").alias("ea"),
        F.col("value_score").alias("va"),
    )
    b = v.select(
        F.col("rel_type").alias("tb"), F.col("embedding").alias("eb"),
        F.col("value_score").alias("vb"),
    )
    pairs = (
        a.join(b, F.col("ta") < F.col("tb"))
        .withColumn("sim", F.round(dot_expr("ea", "eb"), 6))
        # preserve = higher value, tie → type1 (the alphabetical first)
        .withColumn("preserve", F.when(F.col("va") >= F.col("vb"), F.col("ta")).otherwise(F.col("tb")))
        .withColumn("deprecate", F.when(F.col("va") >= F.col("vb"), F.col("tb")).otherwise(F.col("ta")))
    )
    strong = F.col("sim") >= STRONG_T
    moderate = (F.col("sim") >= MODERATE_T) & ~strong

    if mode == "naive":
        action = F.when(strong, "merge").otherwise("skip")
        review = F.lit("none")
        auto = strong
    elif mode == "hitl":
        action = F.when(strong | moderate, "merge").otherwise("skip")
        review = F.when(strong | moderate, "human").otherwise("none")
        auto = F.lit(False)
    else:  # aitl: strong auto-merges, moderate goes to the mocked LLM
        ai_merge = moderate & (F.col("sim") >= AI_MERGE_T)
        action = F.when(strong | ai_merge, "merge").otherwise("skip")
        review = F.when(moderate, "ai").otherwise("none")
        auto = strong | ai_merge

    syn_rows = pairs.select(
        action.alias("action"),
        # MERGE rows name the deprecated type; weak-skip rows name type1
        F.when(action == "merge", F.col("deprecate")).otherwise(F.col("ta")).alias("subject"),
        F.when(action == "merge", F.col("preserve")).otherwise(F.lit(None).cast("string")).alias("target"),
        review.alias("review"),
        auto.alias("auto_execute"),
        F.col("sim").alias("score"),
    )

    # ----- low-value types
    low = v.filter(F.col("value_score") < PRUNE_VALUE_T)
    builtin = F.col("category").isin(*_BUILTIN_CATS)
    zero = F.col("edge_count") == 0

    if mode == "naive":
        lv_action = F.when(builtin, "skip").when(zero, "prune").otherwise("skip")
        lv_review = F.lit("none")
        lv_auto = ~builtin & zero
    elif mode == "hitl":
        lv_action = F.when(builtin, "skip").when(zero, "prune").otherwise("deprecate")
        lv_review = F.when(builtin, "none").otherwise("human")
        lv_auto = F.lit(False)
    else:  # aitl
        ai_dep = F.col("value_score") < AI_DEPRECATE_T
        lv_action = (
            F.when(builtin, "skip").when(zero, "prune")
            .when(ai_dep, "deprecate").otherwise("skip")
        )
        lv_review = F.when(builtin | zero, "none").otherwise("ai")
        lv_auto = ~builtin & (zero | ai_dep)

    low_rows = low.select(
        lv_action.alias("action"),
        F.col("rel_type").alias("subject"),
        F.lit(None).cast("string").alias("target"),
        lv_review.alias("review"),
        lv_auto.alias("auto_execute"),
        F.col("value_score").alias("score"),
    )
    return syn_rows.unionByName(low_rows)


def _u4_oracle(mode: str = "aitl") -> str:
    """DuckDB twin of the AITL decision matrix (the registered mode)."""
    assert mode == "aitl"
    return (
        graph_ctes()
        + f""",
stats AS (
  SELECT e.rel_type, count(*) AS edge_count,
         round(count(*) / 1000.0 + avg(coalesce(e.confidence, 0.5)) * 0.5
               + count(DISTINCT e.src) / 10.0 * 0.3, 6) AS value_score
  FROM edges e GROUP BY e.rel_type
),
vemb AS (SELECT rel_type, emb FROM {osql.unit_vec_cte("'vocab:' || rel_type", 'rel_type', 'vocab')} v),
vt AS (
  SELECT v.rel_type, v.category, ve.emb,
         coalesce(s.edge_count, 0) AS edge_count,
         coalesce(s.value_score, 0.0) AS value_score
  FROM vocab v JOIN vemb ve ON ve.rel_type = v.rel_type
  LEFT JOIN stats s ON s.rel_type = v.rel_type
),
pairs AS (
  SELECT a.rel_type AS ta, b.rel_type AS tb,
         round({osql.dot_sql('a.emb', 'b.emb')}, 6) AS sim,
         CASE WHEN a.value_score >= b.value_score THEN a.rel_type ELSE b.rel_type END AS preserve,
         CASE WHEN a.value_score >= b.value_score THEN b.rel_type ELSE a.rel_type END AS deprecate
  FROM vt a JOIN vt b ON a.rel_type < b.rel_type
),
syn AS (
  SELECT CASE WHEN sim >= {STRONG_T} OR (sim >= {AI_MERGE_T} AND sim < {STRONG_T}) THEN 'merge' ELSE 'skip' END AS action,
         CASE WHEN sim >= {AI_MERGE_T} THEN deprecate ELSE ta END AS subject,
         CASE WHEN sim >= {AI_MERGE_T} THEN preserve ELSE NULL END AS target,
         CASE WHEN sim >= {MODERATE_T} AND sim < {STRONG_T} THEN 'ai' ELSE 'none' END AS review,
         sim >= {AI_MERGE_T} AS auto_execute,
         sim AS score
  FROM pairs
),
lowv AS (
  SELECT CASE WHEN category IN ('provenance', 'structural') THEN 'skip'
              WHEN edge_count = 0 THEN 'prune'
              WHEN value_score < {AI_DEPRECATE_T} THEN 'deprecate'
              ELSE 'skip' END AS action,
         rel_type AS subject, NULL AS target,
         CASE WHEN category IN ('provenance', 'structural') OR edge_count = 0
              THEN 'none' ELSE 'ai' END AS review,
         (category NOT IN ('provenance', 'structural'))
           AND (edge_count = 0 OR value_score < {AI_DEPRECATE_T}) AS auto_execute,
         value_score AS score
  FROM vt WHERE value_score < {PRUNE_VALUE_T}
)
SELECT * FROM syn UNION ALL SELECT * FROM lowv
"""
    )


@query("u4_pruning_recommendations", oracle=_u4_oracle())
def u4_pruning_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AITL strategy end-to-end: strong pairs auto-merge, moderate
    pairs go through the mocked grounded review, low-value types prune/
    deprecate per the matrix. naive/hitl matrices are pinned by
    tests/test_pruning.py."""
    ctx = Ctx.get(spark, sf_dir)
    return pruning_recommendations(ctx, mode="aitl")
