"""Catalog/browse operators (SURVEY.md §2.1 S8, §2.9 F1/F2).

Reference parity:
- S8 catalog rebuild: three aggregate passes (ontologies / documents /
  concepts) into a denormalized browse index with name_lower and
  child_count, stamped with the build epoch
  (`/root/reference/api/app/lib/catalog_facade.py:190-258`).
- F1 trigram fuzzy search: `name_lower LIKE %q%` over a gin_trgm index
  (`catalog_facade.py:406-417`). A columnar scan + contains() replaces
  the trigram index — at 100 TB the catalog is a derived table orders
  of magnitude smaller than the graph, so a pruned scan is the plan.
- F2 regex label match (`query.py:552`) → rlike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes


def build_catalog(ctx: Ctx) -> DataFrame:
    """Three aggregate passes → one browse index (kind, name, name_lower,
    child_count), mirroring the INSERT OVERWRITE rebuild pattern."""
    ontologies = (
        ctx.nodes.groupBy(F.col("ontology").alias("name"))
        .agg(F.count("*").alias("child_count"))
        .withColumn("kind", F.lit("ontology"))
    )
    labels = (
        ctx.nodes.groupBy(F.col("label").alias("name"))
        .agg(F.count("*").alias("child_count"))
        .withColumn("kind", F.lit("label"))
    )
    concepts = (
        ctx.edges.groupBy(F.col("dst").alias("name"))
        .agg(F.count("*").alias("child_count"))
        .withColumn("kind", F.lit("node"))
    )
    return (
        ontologies.unionByName(labels)
        .unionByName(concepts)
        .withColumn("name_lower", F.lower("name"))
        .select("kind", "name", "name_lower", "child_count")
    )


_CATALOG_ORACLE_CTE = """
catalog AS (
  SELECT 'ontology' AS kind, ontology AS name, lower(ontology) AS name_lower,
         CAST(count(*) AS BIGINT) AS child_count
  FROM nodes GROUP BY ontology
  UNION ALL
  SELECT 'label', label, lower(label), CAST(count(*) AS BIGINT) FROM nodes GROUP BY label
  UNION ALL
  SELECT 'node', dst, lower(dst), CAST(count(*) AS BIGINT) FROM edges GROUP BY dst
)"""


@query(
    "s8_catalog_rebuild",
    oracle=graph_ctes(_CATALOG_ORACLE_CTE.strip())
    + """
SELECT kind, CAST(count(*) AS BIGINT) AS entries,
       CAST(sum(child_count) AS BIGINT) AS total_children,
       CAST(max(child_count) AS BIGINT) AS max_children
FROM catalog GROUP BY kind
""",
)
def s8_catalog_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog rebuild summarized per kind (the full index is the
    intermediate `build_catalog` DF — asserting its aggregate shape keeps
    the oracle output bounded)."""
    ctx = Ctx.get(spark, sf_dir)
    return build_catalog(ctx).groupBy("kind").agg(
        F.count("*").alias("entries"),
        F.sum("child_count").alias("total_children"),
        F.max("child_count").alias("max_children"),
    )


@query(
    "f1_fuzzy_search",
    oracle=graph_ctes(_CATALOG_ORACLE_CTE.strip())
    + """
SELECT kind, name, child_count
FROM catalog
WHERE name_lower LIKE '%o1%'
ORDER BY child_count DESC, kind, name
LIMIT 25
""",
)
def f1_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: substring browse over the catalog with deterministic ranking."""
    ctx = Ctx.get(spark, sf_dir)
    return (
        build_catalog(ctx)
        .filter(F.col("name_lower").contains("o1"))
        .select("kind", "name", "child_count")
        .orderBy(F.col("child_count").desc(), "kind", "name")
        .limit(25)
    )


@query(
    "f2_regex_match",
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE regexp_matches(lower(p_name), '.*(gizmo|widget).*')
ORDER BY p_partkey
""",
)
def f2_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: case-insensitive regex name match (`=~ '(?i).*x.*'` analog)."""
    ctx = Ctx.get(spark, sf_dir)
    # no final orderBy (r17, guide §2.4): the driver's hash is
    # order-insensitive and there is no LIMIT depending on the sort —
    # the global sort was a rangepartitioning Exchange + Sort over the
    # full match set (corpus-sized at 100 TB) bought purely for display
    return (
        ctx.tables["part"]
        .filter(F.lower(F.col("p_name")).rlike(".*(gizmo|widget).*"))
        .select("p_partkey", "p_name")
    )
