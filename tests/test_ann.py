"""Persisted IVF index: build-once/query-many parity with the fused
ann_ivf_topk operator, plus directory-level partition pruning on the
probed cells (the 100 TB read shape)."""

from __future__ import annotations


def test_persisted_ivf_index_matches_fused(spark, tmp_path):
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.ann import (
        _QUERY_IDS,
        _vectors,
        ann_ivf_topk,
        build_ivf_index,
        ivf_topk_from_index,
    )
    from knowledge_graph_system_spark.registry import Ctx
    from tests.conftest import SF_DIR

    ctx = Ctx.get(spark, SF_DIR)
    vecs = _vectors(ctx)
    idx = str(tmp_path / "ivf")
    build_ivf_index(vecs, idx)
    queries = vecs.filter(F.col("vec_id").isin(_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    out = ivf_topk_from_index(spark, idx, queries)
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, ann_ivf_topk(spark, SF_DIR).collect()))
    assert got == want and len(got) > 0
    # partition pruning reaches the scan: the vectors read carries a
    # PartitionFilters entry on the cell column (directory pruning)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    after = plan.split("PartitionFilters", 1)[1][:120]
    # e.g. "PartitionFilters: [cell#118 IN (3,6,8,2), ...]"
    assert after.startswith(": [cell") and " IN (" in after
