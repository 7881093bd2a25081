"""Sample-train + IVF-over-centroids assignment
(operators/kmeans_scale.py): the k ∝ N scale contract the semdedup
module documents, now executable — agreement floor vs the exact
assignment, determinism, the end-to-end chain, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _vecs(spark, sf):
    from knowledge_graph_system_spark.functions.scale import fan_out
    from knowledge_graph_system_spark.registry import Ctx

    ctx = Ctx.get(spark, sf)
    return fan_out(
        ctx.tables["embeddings"].select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
    ).localCheckpoint(eager=True)


def test_ivf_assignment_agrees_with_exact(spark):
    """The approximate assignment matches the exact O(N·k·D) argmin on
    >= 90% of vectors at both gate SFs (measured 0.948 / 0.952 with
    nprobe = 2 of ~sqrt(2k) coarse cells) and is deterministic across
    runs; every vector is assigned exactly once."""
    from knowledge_graph_system_spark.operators.kmeans_scale import (
        kmeans_assign_ivf,
    )
    from knowledge_graph_system_spark.operators.semdedup import (
        CLUSTER_TARGET,
        kmeans_assign,
        kmeans_codebook,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        vecs = _vecs(spark, sf)
        n = vecs.count()
        k = max(2, -(-n // CLUSTER_TARGET))
        cb = kmeans_codebook(vecs, k)
        exact = {r["vec_id"]: r["clabel"] for r in kmeans_assign(vecs, k).collect()}
        ivf = {
            r["vec_id"]: r["clabel"]
            for r in kmeans_assign_ivf(vecs, cb).collect()
        }
        assert set(ivf) == set(exact)
        agree = sum(1 for v in exact if ivf[v] == exact[v]) / len(exact)
        assert agree >= 0.9, agree
        rerun = {
            r["vec_id"]: r["clabel"]
            for r in kmeans_assign_ivf(vecs, cb).collect()
        }
        assert rerun == ivf


def test_semdedup_groups_scale_end_to_end(spark):
    """The production chain composes: same output schema as
    semdedup_groups, every duplicate group lives inside ONE cluster
    (the within-cluster contract survives the approximate assignment),
    and exactly one keeper per group."""
    from knowledge_graph_system_spark.operators.kmeans_scale import (
        semdedup_groups_scale,
    )

    out = semdedup_groups_scale(_vecs(spark, SF))
    assert out.columns == ["vec_id", "clabel", "group_id", "keeper"]
    rows = out.collect()
    assert rows
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(r["group_id"], []).append(r)
    for members in groups.values():
        assert len({m["clabel"] for m in members}) == 1
        assert sum(1 for m in members if m["keeper"]) == 1


def test_training_sample_deterministic_and_bounded(spark):
    """The md5-bucket sample is a pure function of the table: two
    draws are identical; the size lands near the budget; an
    under-budget corpus passes through whole."""
    from knowledge_graph_system_spark.operators.kmeans_scale import (
        training_sample,
    )

    vecs = _vecs(spark, "/root/testdata/sf0.01")
    n = vecs.count()
    s1 = sorted(r["vec_id"] for r in training_sample(vecs, 200).collect())
    s2 = sorted(r["vec_id"] for r in training_sample(vecs, 200).collect())
    assert s1 == s2
    assert 0 < len(s1) <= 320  # ~200 requested of 500; md5 spread tolerance
    assert training_sample(vecs, n + 1).count() == n  # pass-through


def test_scale_chain_refuses_degenerate_budget(spark):
    """k > train_max_rows cannot seed a Forgy init — the chain refuses
    loudly (the guard posture) instead of training garbage."""
    from knowledge_graph_system_spark.operators.kmeans_scale import (
        semdedup_groups_scale,
    )

    with pytest.raises(ValueError, match="training "):
        semdedup_groups_scale(_vecs(spark, SF), train_max_rows=3)


def test_ivf_assignment_survives_empty_coarse_cells(spark, monkeypatch):
    """ADVICE r13 (medium): Lloyd carry-forward can leave a coarse cell
    memberless with a stale centroid; pre-fix, a vector whose every
    probed cell was such a ghost silently DROPPED at the cent join,
    breaking the exactly-once assignment contract. The probe list is
    now built from occupied cells only — simulate the degenerate
    trainer state directly and assert output count == input count."""
    from knowledge_graph_system_spark.operators import kmeans_scale

    # cell 2 is empty (no centroid assigned to it) but holds a stale
    # coarse centroid at [99.0] — strictly nearest for the [99.0]
    # vector, so nprobe=1 would have probed ONLY the ghost cell
    monkeypatch.setattr(
        kmeans_scale,
        "coarse_cells",
        lambda cb, n_coarse, iters=3: ([1, 1], [[0.0], [99.0]]),
    )
    vecs = spark.createDataFrame(
        [("a", [0.1]), ("b", [99.0])], "vec_id string, v array<double>"
    )
    cb = [[0.0], [0.2]]
    out = kmeans_scale.kmeans_assign_ivf(vecs, cb, n_coarse=2, nprobe=1)
    rows = {r["vec_id"]: r["clabel"] for r in out.collect()}
    assert set(rows) == {"a", "b"}  # every vector assigned exactly once
    assert rows["b"] == 2  # best centroid among OCCUPIED cells


def test_training_sample_chains_past_bucket_floor(spark):
    """ADVICE r13 (low): when n_rows > max_rows·_BUCKETS the single
    draw floors at keep=1 and overshoots the budget ~n_rows/_BUCKETS —
    the chained second draw (salted key) now brings the expectation
    back under max_rows. Deterministic by construction."""
    from knowledge_graph_system_spark.operators.kmeans_scale import (
        training_sample,
    )
    from knowledge_graph_system_spark.operators.sampling import _BUCKETS

    n = 4 * _BUCKETS  # 40k rows: > max_rows * _BUCKETS for max_rows=3
    df = spark.range(n).select(F.col("id").cast("string").alias("vec_id"))
    out = training_sample(df, max_rows=3, n_rows=n)
    c1 = out.count()
    # single-draw floor would keep ~n/_BUCKETS = 4x the budget EVERY
    # time the regime deepens; the chain keeps the expectation <= 3.
    # md5 is deterministic, so the count is a constant — bound it
    # loosely (Poisson-ish around <= max_rows) and pin determinism.
    assert c1 <= 12, c1
    assert out.count() == c1
    assert sorted(r["vec_id"] for r in out.collect()) == sorted(
        r["vec_id"] for r in training_sample(df, max_rows=3, n_rows=n).collect()
    )


def test_kmeans_codebook_refuses_short_seed(spark):
    """ADVICE r13 (low): fewer than k vectors cannot Forgy-init a
    k-codebook — refuse loudly instead of silently shrinking the
    codebook (which would degrade the k ∝ N contract without signal)."""
    from knowledge_graph_system_spark.operators.semdedup import (
        kmeans_codebook,
    )

    vecs = spark.createDataFrame(
        [("a", [0.1, 0.2]), ("b", [0.3, 0.4])],
        "vec_id string, v array<double>",
    )
    with pytest.raises(ValueError, match="Forgy"):
        kmeans_codebook(vecs, k=5)


def test_ivf_assignment_plan_shape(spark):
    """No Python eval, no cartesian: the coarse scoring is a row-local
    projection off a broadcast one-row frame, the candidate join is an
    equi-join on the bounded cell key, the argmin a per-vector
    window."""
    from knowledge_graph_system_spark.operators.kmeans_scale import (
        kmeans_assign_ivf,
    )
    from knowledge_graph_system_spark.operators.semdedup import (
        kmeans_codebook,
    )

    vecs = _vecs(spark, SF)
    df = kmeans_assign_ivf(vecs, kmeans_codebook(vecs, 10))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "ccell" in plan  # the cell equi-join key survived planning
