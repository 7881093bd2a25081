"""100 TB posture: bucketed tables co-locate the hot joins.

On a real cluster the node/edge tables are written bucketed by their
join keys so traversal/degree joins need NO exchange of the big side.
This test proves the plan shape: the scan side of a bucketed join
carries SelectedBucketsCount and no Exchange above it."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_bucketed_join_skips_exchange(spark, ctx, tmp_path):
    # (warehouse dir is a static conf; tables are dropped in finally,
    # and spark-warehouse/ is gitignored)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    try:
        edges_t = f"edges_b_{uuid.uuid4().hex[:8]}"
        nodes_t = f"nodes_b_{uuid.uuid4().hex[:8]}"
        ctx.edges.write.bucketBy(8, "src").sortBy("src").saveAsTable(edges_t)
        ctx.nodes.withColumnRenamed("node_id", "src").write.bucketBy(8, "src").sortBy(
            "src"
        ).saveAsTable(nodes_t)

        joined = spark.table(edges_t).join(spark.table(nodes_t), "src")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in plan
        # neither scan needs a shuffle: bucket layout IS the partitioning
        assert "Exchange hashpartitioning" not in plan
        # and the result is still correct
        n = joined.count()
        assert n == ctx.edges.join(
            ctx.nodes.withColumnRenamed("node_id", "src"), "src"
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {edges_t}")
        spark.sql(f"DROP TABLE IF EXISTS {nodes_t}")


def test_salted_join_equals_plain_join(ctx, spark):
    from knowledge_graph_system_spark.functions.skew import salted_join

    left = ctx.edges.select("src", "rel_type")  # skewed: hubs have many edges
    right = ctx.nodes.select(F.col("node_id").alias("src"), "label")
    plain = left.join(right, "src").groupBy("label").count().collect()
    salted = salted_join(left, right, "src", n_salts=4).groupBy("label").count().collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_join_rejects_unsupported_how(ctx):
    import pytest
    from knowledge_graph_system_spark.functions.skew import salted_join

    left = ctx.edges.select("src")
    right = ctx.nodes.select(F.col("node_id").alias("src"))
    for bad in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(left, right, "src", n_salts=4, how=bad)
