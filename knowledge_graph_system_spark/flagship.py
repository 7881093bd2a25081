"""Flagship query: the reference's `/query/search` lifecycle, Spark-first.

Reference trace (SURVEY.md §3.1): embed query → full-scan cosine →
threshold → top-k → hydrate evidence/grounding. There that's one
Postgres round-trip per batch plus Python loops; here it is a single
lazy DAG: codegen'd dot-product scan → TakeOrderedAndProject top-k →
broadcast-joined degree/evidence hydration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.vectors import unit_vec_py
from .operators.vector import vector_search
from .registry import Ctx


def flagship_search(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """V1 top-k → hydrate with degree (A1), grounding (A4), and
    confidence (A2/A3) — the reference's `_hydrate_grounding_batch`
    stage (`routes/queries.py:82-159`) as three broadcast-joined
    derived tables instead of five hand-batched query rounds."""
    from .operators.aggregates import confidence_score, confidence_signals
    from .operators.scores import grounding

    ctx = Ctx.get(spark, sf_dir)
    hits = vector_search(ctx.nodes_emb, unit_vec_py("query:flagship"), threshold=0.2, k=k)
    out_deg = ctx.edges.groupBy(F.col("src").alias("node_id")).agg(
        F.count("*").alias("out_degree")
    )
    in_deg = ctx.edges.groupBy(F.col("dst").alias("node_id")).agg(
        F.count("*").alias("in_degree")
    )
    conf = confidence_score(confidence_signals(ctx.edges)).select(
        "node_id", "confidence_score", "confidence_level"
    )
    ground = grounding(ctx.edges).select("node_id", "grounding")
    return (
        F.broadcast(hits)
        .join(out_deg, "node_id", "left")
        .join(in_deg, "node_id", "left")
        .join(conf, "node_id", "left")
        .join(ground, "node_id", "left")
        .select(
            "node_id",
            "label",
            "score",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("confidence_score", F.lit(0.0)).alias("confidence_score"),
            F.coalesce("confidence_level", F.lit("low")).alias("confidence_level"),
            "grounding",
        )
        .orderBy(F.col("score").desc(), "node_id")
    )
