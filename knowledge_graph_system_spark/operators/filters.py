"""Projection / filter / predicate operators (SURVEY.md §2.2, P1–P8).

Reference parity:
- P1/P2 label-scoped match with caller predicate + limit
  (`/root/reference/api/app/lib/query_facade.py:105-141,446,543`).
- P3 epistemic-status → rel-type whitelist semi-join
  (`/root/reference/api/app/routes/queries.py:259-314,1355-1372`).
- P4 ontology scope filter (`routes/queries.py:617-625`).
- P5 confidence filter, NULL passes (`graph-accel/core/src/traversal.rs:97-103`).
- P6 learned-knowledge filter with ORDER BY + SKIP/LIMIT
  (`api/app/lib/age_client/query.py:381-442`).
- P8 embedding-strip projection (`routes/queries.py:1746,1773`).

Every filter here is a Catalyst predicate that pushes into the parquet
scan (verified via explain: PushedFilters) — the reference post-filters
in Python after pulling rows out of Postgres.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes


def match_nodes(
    nodes: DataFrame,
    label: str | None = None,
    where: Column | None = None,
    limit: int | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    """P1/P2: label-scoped select with caller predicate. A limit without
    an order is nondeterministic on a distributed engine, so `limit`
    requires `order_by` (default: node_id)."""
    df = nodes
    if label is not None:
        df = df.filter(F.col("label") == label)
    if where is not None:
        df = df.filter(where)
    if limit is not None:
        df = df.orderBy(*(order_by or ["node_id"])).limit(limit)
    return df


def confidence_pass(min_confidence: float) -> Column:
    """P5: NULL confidence passes the filter (reference NaN rule)."""
    return (F.col("confidence") >= min_confidence) | F.col("confidence").isNull()


def epistemic_whitelist(
    edges: DataFrame, vocab: DataFrame, statuses: list[str]
) -> DataFrame:
    """P3: restrict edges to rel-types whose epistemic_status is allowed.
    vocab is vocabulary-sized → broadcast left-semi join, no shuffle."""
    allowed = vocab.filter(F.col("epistemic_status").isin(statuses)).select("rel_type")
    return edges.join(F.broadcast(allowed), "rel_type", "left_semi")


@query(
    "p1_match_nodes",
    oracle=graph_ctes()
    + """
SELECT node_id, name, ontology, round(weight, 2) AS weight
FROM nodes WHERE label = 'Part' AND weight > 905.0
ORDER BY node_id LIMIT 100
""",
)
def p1_match_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    return match_nodes(
        ctx.nodes, label="Part", where=F.col("weight") > 905.0, limit=100
    ).select("node_id", "name", "ontology", F.round("weight", 2).alias("weight"))


@query(
    "p3_epistemic_filter",
    oracle=graph_ctes()
    + """
SELECT e.rel_type, CAST(count(*) AS BIGINT) AS n_edges
FROM edges e
WHERE e.rel_type IN (SELECT rel_type FROM vocab WHERE epistemic_status IN ('AFFIRMATIVE', 'HISTORICAL'))
GROUP BY e.rel_type
""",
)
def p3_epistemic_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    kept = epistemic_whitelist(ctx.edges, ctx.vocab, ["AFFIRMATIVE", "HISTORICAL"])
    return kept.groupBy("rel_type").agg(F.count("*").alias("n_edges"))


@query(
    "p4_ontology_scope",
    oracle=graph_ctes()
    + """
SELECT ontology, label, CAST(count(*) AS BIGINT) AS n,
       round(sum(weight), 2) AS total_weight
FROM nodes WHERE ontology IN ('BUILDING', 'MACHINERY', 'SUPPLY')
GROUP BY ontology, label
""",
)
def p4_ontology_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    return (
        ctx.nodes.filter(F.col("ontology").isin("BUILDING", "MACHINERY", "SUPPLY"))
        .groupBy("ontology", "label")
        .agg(F.count("*").alias("n"), F.round(F.sum("weight"), 2).alias("total_weight"))
    )


@query(
    "p5_confidence_filter",
    oracle=graph_ctes()
    + """
SELECT rel_type,
       CAST(count(*) AS BIGINT) AS kept,
       CAST(sum(CASE WHEN confidence IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_passed
FROM edges WHERE confidence >= 0.6 OR confidence IS NULL
GROUP BY rel_type
""",
)
def p5_confidence_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    return (
        ctx.edges.filter(confidence_pass(0.6))
        .groupBy("rel_type")
        .agg(
            F.count("*").alias("kept"),
            F.sum(F.when(F.col("confidence").isNull(), 1).otherwise(0)).alias(
                "null_passed"
            ),
        )
    )


@query(
    "p6_ordered_page",
    oracle="""
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 10
""",
)
def p6_ordered_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: predicate + ORDER BY + SKIP/LIMIT pagination (`query.py:381-442`).
    Spark ≥3.4 offset() is a logical operator — Catalyst folds it into the
    TakeOrdered physical op, no full sort."""
    ctx = Ctx.get(spark, sf_dir)
    return (
        ctx.tables["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(10)
        .limit(20)
    )


@query(
    "p8_strip_projection",
    oracle=graph_ctes()
    + """
SELECT node_id, label, ontology FROM nodes WHERE label = 'Supplier'
""",
)
def p8_strip_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: drop the embedding column from returned props. Column pruning
    means the 16-double array is never even computed — check ReadSchema."""
    ctx = Ctx.get(spark, sf_dir)
    return ctx.nodes_emb.filter(F.col("label") == "Supplier").drop(
        "embedding", "name", "weight"
    )
