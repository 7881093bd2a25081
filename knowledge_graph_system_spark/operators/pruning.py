"""Vocabulary pruning / merge recommendations (SURVEY.md §2.11 U4).

Reference parity: LLM-assisted merge evaluation + rule-based pruning
recommendations over the relationship vocabulary
(`/root/reference/api/app/lib/pruning_strategies.py:77-941`). The LLM
judgment is external there; the rule layer — low-value types become
prune candidates, high-similarity pairs become merge candidates with
the lower-value member absorbed — is deterministic and reproduced here
as a composition of V6 (synonym similarity) and A10 (value score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import oracle_snippets as osql
from ..functions.vectors import dot_expr
from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes

MERGE_SIM_T = 0.2
PRUNE_VALUE_T = 1.0


@query(
    "u4_pruning_recommendations",
    oracle=graph_ctes()
    + f""",
vemb AS (SELECT rel_type, emb FROM {osql.unit_vec_cte("'vocab:' || rel_type", 'rel_type', 'vocab')} v),
value_t AS (
  SELECT e.rel_type,
         round(count(*) / 1000.0 + avg(coalesce(e.confidence, 0.5)) * 0.5
               + count(DISTINCT e.src) / 10.0 * 0.3, 6) AS value_score
  FROM edges e GROUP BY e.rel_type
),
merges AS (
  SELECT a.rel_type AS keep, b.rel_type AS absorb,
         round({osql.dot_sql('a.emb', 'b.emb')}, 6) AS sim
  FROM vemb a JOIN vemb b ON a.rel_type <> b.rel_type
  JOIN value_t va ON va.rel_type = a.rel_type
  JOIN value_t vb ON vb.rel_type = b.rel_type
  WHERE round({osql.dot_sql('a.emb', 'b.emb')}, 6) >= {MERGE_SIM_T}
    AND (va.value_score > vb.value_score
         OR (va.value_score = vb.value_score AND a.rel_type < b.rel_type))
),
prunes AS (
  SELECT rel_type, value_score FROM value_t
  WHERE value_score < {PRUNE_VALUE_T}
    AND rel_type NOT IN (SELECT absorb FROM merges)
)
SELECT 'merge' AS action, keep AS target, absorb AS subject, sim AS score FROM merges
UNION ALL
SELECT 'prune', NULL, rel_type, value_score FROM prunes
""",
)
def u4_pruning_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge high-similarity type pairs into the higher-value member;
    prune low-value types not already absorbed. Vocabulary-sized inputs →
    everything is broadcast; the rule layer is pure column logic."""
    ctx = Ctx.get(spark, sf_dir)
    value = ctx.edges.groupBy("rel_type").agg(
        F.round(
            F.count("*") / 1000.0
            + F.avg(F.coalesce(F.col("confidence"), F.lit(0.5))) * 0.5
            + F.countDistinct("src") / 10.0 * 0.3,
            6,
        ).alias("value_score")
    )
    v = ctx.vocab.select("rel_type", "embedding").join(F.broadcast(value), "rel_type")
    a = v.select(
        F.col("rel_type").alias("keep"),
        F.col("embedding").alias("ea"),
        F.col("value_score").alias("va"),
    )
    b = v.select(
        F.col("rel_type").alias("absorb"),
        F.col("embedding").alias("eb"),
        F.col("value_score").alias("vb"),
    )
    merges = (
        a.join(b, F.col("keep") != F.col("absorb"))
        .withColumn("sim", F.round(dot_expr("ea", "eb"), 6))
        .filter(
            (F.col("sim") >= MERGE_SIM_T)
            & (
                (F.col("va") > F.col("vb"))
                | ((F.col("va") == F.col("vb")) & (F.col("keep") < F.col("absorb")))
            )
        )
        .select(
            F.lit("merge").alias("action"),
            F.col("keep").alias("target"),
            F.col("absorb").alias("subject"),
            F.col("sim").alias("score"),
        )
    )
    prunes = (
        value.filter(F.col("value_score") < PRUNE_VALUE_T)
        .join(merges.select(F.col("subject").alias("rel_type")), "rel_type", "left_anti")
        .select(
            F.lit("prune").alias("action"),
            F.lit(None).cast("string").alias("target"),
            F.col("rel_type").alias("subject"),
            F.col("value_score").alias("score"),
        )
    )
    return merges.unionByName(prunes)
