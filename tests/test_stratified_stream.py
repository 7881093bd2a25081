"""Streaming CCNet-stratified selection (streaming/stratified_stream.py)
— prepared r17/r18 registry candidate: stream==batch parity against
cur_ccnet_budget's registered oracle (the order-free parity class),
per-epoch stratification recalibration off the accumulated cell log,
and the static-model scoring pin for lm_score_from_model."""

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


def test_lm_score_from_model_matches_self_trained(spark):
    """Value-parity pin (lm_score_from_model docstring): the
    scoring-only path under a pre-trained model returns EXACTLY what
    lm_score's train-then-score path returns when handed the same
    corpus's model. Since the r17 fold lm_score delegates here, so
    this now guards the delegation composition (the plan-level
    byte-stability pin lives in tests/test_lm_fold.py)."""
    from knowledge_graph_system_spark.operators.lm import (
        bigram_counts,
        lm_score,
        lm_score_from_model,
    )
    from knowledge_graph_system_spark.registry import Ctx

    docs = Ctx.get(spark, SF).tables["documents"]
    bigrams, unigrams, v = bigram_counts(docs)
    got = sorted(map(tuple, lm_score_from_model(docs, bigrams, unigrams, v).collect()))
    want = sorted(map(tuple, lm_score(docs).collect()))
    assert len(got) > 0 and got == want


def test_candidate_st_ccnet_stream(spark):
    """Driver-style compare at BOTH gate scale factors: the streamed
    rollup equals cur_ccnet_budget's registered SQL verbatim — the
    real foreachBatch/availableNow path."""
    from knowledge_graph_system_spark.streaming.stratified_stream import (
        st_ccnet_stream,
        st_ccnet_stream_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, st_ccnet_stream(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(st_ccnet_stream_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_ccnet_stream_batch_count_invariance(spark):
    """Order-free parity, directly: static-model scoring is row-local
    and cell mass is an order-free sum, so ANY batch partitioning
    yields the same final selection — 1-batch and 3-batch replays
    agree exactly."""
    from knowledge_graph_system_spark.streaming.stratified_stream import (
        streaming_ccnet_select,
    )

    one = sorted(map(tuple, streaming_ccnet_select(spark, SF, n_batches=1).collect()))
    three = sorted(map(tuple, streaming_ccnet_select(spark, SF, n_batches=3).collect()))
    assert len(one) > 0 and one == three


def test_ccnet_stream_epoch_strata(spark):
    """Per-epoch recalibration contract: the final epoch's tercile
    boundaries equal the batch ccnet_buckets thresholds (computed over
    the full corpus), every epoch's per-stratum budget is
    floor(frac * that stratum's arrived mass), thresholds are within
    the stratum's score range, and arrived mass is non-decreasing —
    all derived from the accumulated CELL log, never a doc re-scan."""
    from knowledge_graph_system_spark.operators.classifier import _CCNET_FRACS
    from knowledge_graph_system_spark.operators.lm import ccnet_buckets, lm_score
    from knowledge_graph_system_spark.registry import Ctx
    from knowledge_graph_system_spark.streaming.stratified_stream import (
        streaming_ccnet_select,
    )

    stats: list = []
    streaming_ccnet_select(spark, SF, n_batches=3, stats=stats)
    assert len(stats) == 3
    by_epoch = sorted(stats, key=lambda s: s["epoch"])
    masses = [sum(st["mass"] for st in s["strata"].values()) for s in by_epoch]
    assert masses == sorted(masses)
    for s in by_epoch:
        assert s["t1"] is not None and s["t2"] is not None and s["t1"] <= s["t2"]
        for name, st in s["strata"].items():
            assert st["b"] == int(_CCNET_FRACS[name] * st["mass"])
            assert st["threshold"] is not None

    # final epoch terciles == the batch machinery's exact thresholds
    docs = Ctx.get(spark, SF).tables["documents"]
    scored = lm_score(docs).localCheckpoint(eager=True)
    t1, t2 = scored.stat.approxQuantile("lm_logp", [1 / 3, 2 / 3], 0.0)
    assert by_epoch[-1]["t1"] == t1
    assert by_epoch[-1]["t2"] == t2
    # ... and the batch bucket assignment at those boundaries matches
    # the per-stratum doc masses the final epoch derived from the log
    from pyspark.sql import functions as F

    batch_mass = {
        r["bucket"]: r["m"]
        for r in ccnet_buckets(scored)
        .groupBy("bucket")
        .agg(F.sum(F.col("n_bigrams") + 1).cast("bigint").alias("m"))
        .collect()
    }
    for name, st in by_epoch[-1]["strata"].items():
        assert st["mass"] == batch_mass[name]


def test_epoch_strata_empty_log(spark):
    """ADVICE r16: an epoch whose accumulated cell log is still empty
    (first trigger delivered only sub-2-word docs) returns the explicit
    empty contract instead of raising TypeError on a None-threshold
    comparison inside foreachBatch."""
    from knowledge_graph_system_spark.streaming.stratified_stream import (
        epoch_strata,
    )

    empty = spark.createDataFrame([], "lm_logp double, n_docs bigint, m bigint")
    out = epoch_strata(empty)
    assert out["t1"] is None and out["t2"] is None
    assert set(out["strata"]) == {"head", "middle", "tail"}
    for st in out["strata"].values():
        assert st == {"b": 0, "threshold": None, "mass": 0}


def test_ccnet_stream_state_is_narrow(spark):
    """The only per-doc state the stream keeps is the 3-column scored
    projection — no text column survives the trigger."""
    from knowledge_graph_system_spark.operators.lm import bigram_counts
    from knowledge_graph_system_spark.registry import Ctx
    from knowledge_graph_system_spark.streaming.stratified_stream import (
        score_batch_lm,
    )

    docs = Ctx.get(spark, SF).tables["documents"]
    bigrams, unigrams, v = bigram_counts(docs)
    out = score_batch_lm(docs.limit(5), bigrams, unigrams, v)
    assert out.columns == ["doc_id", "lm_logp", "n_tokens"]
    assert out.count() == 5
