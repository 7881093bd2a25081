"""Property-graph view derived from the driver's star schema.

FIXTURES.md pins this derivation so graph operators stay DuckDB-checkable:
  nodes := customer ∪ supplier ∪ part ∪ orders   (typed key prefix + key)
  edges := customer→order (PLACED), order→part ('L'||linenumber%7),
           part→supplier (SUPPLIED_BY); confidence from discount/tax,
           NULL when the source value is 0 (NULL must PASS confidence
           filters — reference semantics, `/root/reference/graph-accel/
           core/src/traversal.rs:97-103`).

The reference's graph lives in Apache AGE with a Rust in-memory
accelerator (`/root/reference/graph-accel/core/src/graph.rs:77-260`);
here the cached columnar edge DataFrame *is* the accelerator. Node ids
are strings (`'C42'`) matching the reference's string concept_ids.

Scale posture: nodes/edges are plain DataFrames built from pushed-down
parquet scans; at 100 TB they'd be bucketed by id-hash so the iterative
BFS joins co-locate. `graph_ctes()` emits the bit-equivalent DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import with_unit_vec

# Static relationship vocabulary for the derived graph (all 9 types occur:
# l_linenumber spans 1..7 so L0..L6 are all present at every sf).
# Polarity pairs mirror the reference's SUPPORTS/CONTRADICTS-style axis
# (`/root/reference/api/app/lib/age_client/grounding.py:151-157`).
POLARITY_PAIRS = [("L0", "L1"), ("L2", "L3"), ("L4", "L5")]
VOCABULARY = [
    # (rel_type, category, epistemic_status)
    ("PLACED", "provenance", "HISTORICAL"),
    ("SUPPLIED_BY", "structural", "AFFIRMATIVE"),
    ("L0", "semantic", "AFFIRMATIVE"),
    ("L1", "semantic", "CONTRADICTORY"),
    ("L2", "semantic", "AFFIRMATIVE"),
    ("L3", "semantic", "CONTRADICTORY"),
    ("L4", "semantic", "AFFIRMATIVE"),
    ("L5", "semantic", "CONTRADICTORY"),
    ("L6", "semantic", "UNCLASSIFIED"),
]


def _prefixed(col: str, prefix: str):
    return F.concat(F.lit(prefix), F.col(col).cast("string"))


def nodes_df(t: dict[str, DataFrame]) -> DataFrame:
    """All graph nodes: node_id, label, name, ontology, weight."""
    c = t["customer"].select(
        _prefixed("c_custkey", "C").alias("node_id"),
        F.lit("Customer").alias("label"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("ontology"),
        F.col("c_acctbal").cast("double").alias("weight"),
    )
    s = t["supplier"].select(
        _prefixed("s_suppkey", "S").alias("node_id"),
        F.lit("Supplier").alias("label"),
        F.col("s_name").alias("name"),
        F.lit("SUPPLY").alias("ontology"),
        F.col("s_acctbal").cast("double").alias("weight"),
    )
    p = t["part"].select(
        _prefixed("p_partkey", "P").alias("node_id"),
        F.lit("Part").alias("label"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("ontology"),
        F.col("p_retailprice").cast("double").alias("weight"),
    )
    o = t["orders"].select(
        _prefixed("o_orderkey", "O").alias("node_id"),
        F.lit("Order").alias("label"),
        F.col("o_orderstatus").alias("name"),
        F.col("o_orderpriority").alias("ontology"),
        F.col("o_totalprice").cast("double").alias("weight"),
    )
    return c.unionByName(s).unionByName(p).unionByName(o)


def edges_df(t: dict[str, DataFrame]) -> DataFrame:
    """All graph edges: src, dst, rel_type, confidence (NULL allowed)."""
    placed = t["orders"].select(
        _prefixed("o_custkey", "C").alias("src"),
        _prefixed("o_orderkey", "O").alias("dst"),
        F.lit("PLACED").alias("rel_type"),
        F.lit(1.0).cast("double").alias("confidence"),
    )
    contains = t["lineitem"].select(
        _prefixed("l_orderkey", "O").alias("src"),
        _prefixed("l_partkey", "P").alias("dst"),
        F.concat(F.lit("L"), (F.col("l_linenumber") % 7).cast("string")).alias("rel_type"),
        F.when(F.col("l_discount") == 0, F.lit(None).cast("double"))
        .otherwise(F.least(F.col("l_discount") * 3.0, F.lit(1.0)))
        .alias("confidence"),
    )
    supplied = t["lineitem"].select(
        _prefixed("l_partkey", "P").alias("src"),
        _prefixed("l_suppkey", "S").alias("dst"),
        F.lit("SUPPLIED_BY").alias("rel_type"),
        F.when(F.col("l_tax") == 0, F.lit(None).cast("double"))
        .otherwise(F.least(F.col("l_tax") * 4.0, F.lit(1.0)))
        .alias("confidence"),
    )
    return placed.unionByName(contains).unionByName(supplied)


def vocabulary_df(spark: SparkSession) -> DataFrame:
    """Relationship-type registry with deterministic embeddings.

    Mirrors kg_api.relationship_vocabulary (`/root/reference/schema/
    00_baseline.sql:2800`): rel_type, category, epistemic_status, embedding.
    """
    from ..functions.scale import local_df

    df = local_df(
        spark, VOCABULARY, "rel_type string, category string, epistemic_status string"
    )
    return with_unit_vec(df, "concat('vocab:', rel_type)", out_col="embedding")


def nodes_with_embeddings(t: dict[str, DataFrame]) -> DataFrame:
    """Nodes + deterministic unit embedding seeded by node_id.

    Mirrors the reference's seeded mock embeddings
    (`/root/reference/api/app/lib/mock_ai_provider.py:176-213`).
    """
    return with_unit_vec(nodes_df(t), "node_id", out_col="embedding")


# ---------------------------------------------------------------------------
# DuckDB oracle twin — MUST stay in lockstep with the DataFrames above.
# ---------------------------------------------------------------------------

NODES_CTE = """
SELECT 'C' || c_custkey AS node_id, 'Customer' AS label, c_name AS name,
       c_mktsegment AS ontology, CAST(c_acctbal AS DOUBLE) AS weight FROM customer
UNION ALL
SELECT 'S' || s_suppkey, 'Supplier', s_name, 'SUPPLY', CAST(s_acctbal AS DOUBLE) FROM supplier
UNION ALL
SELECT 'P' || p_partkey, 'Part', p_name, p_brand, CAST(p_retailprice AS DOUBLE) FROM part
UNION ALL
SELECT 'O' || o_orderkey, 'Order', o_orderstatus, o_orderpriority, CAST(o_totalprice AS DOUBLE) FROM orders
""".strip()

EDGES_CTE = """
SELECT 'C' || o_custkey AS src, 'O' || o_orderkey AS dst,
       'PLACED' AS rel_type, CAST(1.0 AS DOUBLE) AS confidence FROM orders
UNION ALL
SELECT 'O' || l_orderkey, 'P' || l_partkey, 'L' || (l_linenumber % 7),
       CASE WHEN l_discount = 0 THEN NULL ELSE least(l_discount * 3.0, 1.0) END FROM lineitem
UNION ALL
SELECT 'P' || l_partkey, 'S' || l_suppkey, 'SUPPLIED_BY',
       CASE WHEN l_tax = 0 THEN NULL ELSE least(l_tax * 4.0, 1.0) END FROM lineitem
""".strip()

VOCAB_VALUES = ", ".join(f"('{r}', '{c}', '{s}')" for r, c, s in VOCABULARY)
VOCAB_CTE = (
    f"SELECT * FROM (VALUES {VOCAB_VALUES}) "
    "AS v(rel_type, category, epistemic_status)"
)


def graph_ctes(*extra: str) -> str:
    """`WITH nodes AS (...), edges AS (...), vocab AS (...)` prefix for oracles."""
    parts = [
        f"nodes AS ({NODES_CTE})",
        f"edges AS ({EDGES_CTE})",
        f"vocab AS ({VOCAB_CTE})",
        *extra,
    ]
    # RECURSIVE is harmless when unused and required when a later CTE recurses
    return "WITH RECURSIVE " + ",\n".join(parts)
