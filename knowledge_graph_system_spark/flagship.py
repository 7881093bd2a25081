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
    ctx = Ctx.get(spark, sf_dir)
    hits = vector_search(ctx.nodes_emb, unit_vec_py("query:flagship"), threshold=0.2, k=k)
    # evidence hydration: degree per node (A1) — hits is tiny → broadcast it
    out_deg = ctx.edges.groupBy(F.col("src").alias("node_id")).agg(
        F.count("*").alias("out_degree")
    )
    in_deg = ctx.edges.groupBy(F.col("dst").alias("node_id")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        F.broadcast(hits)
        .join(out_deg, "node_id", "left")
        .join(in_deg, "node_id", "left")
        .select(
            "node_id",
            "label",
            "score",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .orderBy(F.col("score").desc(), "node_id")
    )
