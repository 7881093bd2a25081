"""DSIR importance resampling (operators/dsir.py) — prepared r15+
registry candidate: driver-style oracle compares plus the mechanism,
budget, determinism, and plan-shape contracts."""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def _oracle_rows(sql: str, sf: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_r15_candidate_cur_dsir_select(spark):
    """Driver-style compare at BOTH gate scale factors: hashed-bigram
    importance weights + Gumbel top-k selection + per-source rollup,
    hash-exact against the generated DuckDB twin."""
    from knowledge_graph_system_spark.operators.dsir import (
        cur_dsir_select,
        cur_dsir_select_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, cur_dsir_select(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(cur_dsir_select_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_dsir_weights_favor_target_like_docs(spark):
    """The importance log-weight separates the classes it was fit on:
    mean w over TARGET docs exceeds mean w over non-target docs at
    both gate SFs (the weight is ln p_target - ln p_raw summed over
    the doc's grams — target docs must score higher on average, or
    the estimator learned nothing)."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.dsir import (
        _TARGET_EXPR,
        dsir_scores,
    )
    from knowledge_graph_system_spark.registry import Ctx

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = Ctx.get(spark, sf).tables["documents"]
        flagged = docs.withColumn("_ws", F.split("text", " ")).select(
            "doc_id", F.expr(_TARGET_EXPR).alias("is_target")
        )
        rows = (
            dsir_scores(docs)
            .join(flagged, "doc_id")
            .groupBy("is_target")
            .agg(F.avg("w").alias("mw"))
            .collect()
        )
        mw = {r["is_target"]: r["mw"] for r in rows}
        assert mw[True] > mw[False] + 0.1


def test_dsir_keep_fraction_and_resampling(spark):
    """(a) exactly floor(KEEP_FRAC * n_docs) documents are kept;
    (b) the Gumbel perturbation makes the kept set a genuine RESAMPLE,
    not the argmax slice — it must differ from plain top-K by w
    (mode-collapse guard, the paper's point)."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.dsir import (
        _KEEP_FRAC,
        cur_dsir_select,
        dsir_scores,
    )
    from knowledge_graph_system_spark.operators.classifier import (
        token_budget_filter,
    )
    from knowledge_graph_system_spark.registry import Ctx

    docs = Ctx.get(spark, SF).tables["documents"]
    n_docs = docs.count()
    k = int(_KEEP_FRAC * n_docs)
    rolled = cur_dsir_select(spark, SF).collect()
    assert sum(r["n_sel"] for r in rolled) == k

    scored = dsir_scores(docs)
    bframe = spark.createDataFrame([(k,)], "b bigint")
    kept = {
        r["doc_id"]
        for r in token_budget_filter(
            scored.withColumn("n_tokens", F.lit(1).cast("bigint")),
            bframe,
            token_col="n_tokens",
            score_col="score",
        ).collect()
    }
    topk_by_w = {
        r["doc_id"]
        for r in scored.orderBy(F.desc("w"), F.asc("doc_id")).limit(k).collect()
    }
    assert len(kept) == k
    assert kept != topk_by_w  # resampling, not argmax


def test_dsir_determinism_and_bounded_ratio_frame(spark):
    """A repartitioned input yields the identical rollup (the hash
    'randomness' is a pure function of the data), and the log-ratio
    frame is bounded by the bucket count regardless of corpus size."""
    from knowledge_graph_system_spark.operators.dsir import (
        _B,
        cur_dsir_select,
        doc_gram_buckets,
        dsir_logratios,
    )
    from knowledge_graph_system_spark.registry import Ctx

    a = sorted(map(tuple, cur_dsir_select(spark, SF).collect()))
    b = sorted(map(tuple, cur_dsir_select(spark, SF).collect()))
    assert a == b
    docs = Ctx.get(spark, SF).tables["documents"]
    lrs = dsir_logratios(doc_gram_buckets(docs.repartition(13)))
    assert lrs.count() <= _B


def test_dsir_plan_is_jvm_side(spark):
    """No Python evaluation, no cartesian in the executed plan — the
    log-ratio and budget frames ride broadcasts."""
    from knowledge_graph_system_spark.operators.dsir import cur_dsir_select

    df = cur_dsir_select(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_target_matches_graded_teacher(spark):
    """Drift trip-wire (review finding r14): dsir's _TARGET_EXPR is a
    re-statement of the graded quality-heuristic teacher
    (t_quality_score arithmetic == classifier._Y_EXPR). If either copy
    of the formula changes without the other, this fails — the DSIR
    weights would otherwise silently fit a stale teacher."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.classifier import (
        _X_EXPR,
        _Y_EXPR,
    )
    from knowledge_graph_system_spark.operators.dsir import _TARGET_EXPR
    from knowledge_graph_system_spark.registry import Ctx

    docs = Ctx.get(spark, SF).tables["documents"]
    both = (
        docs.withColumn("_ws", F.split("text", " "))
        .withColumn("x", F.expr(_X_EXPR))
        .select(
            F.expr(_TARGET_EXPR).alias("dsir_t"),
            F.expr(_Y_EXPR).alias("teacher_y"),
        )
    )
    assert both.filter(F.col("dsir_t") != F.col("teacher_y")).count() == 0
    assert both.filter(F.col("dsir_t")).count() > 0
