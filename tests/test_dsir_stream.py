"""Streaming DSIR selection (streaming/dsir_stream.py) — prepared r19
registry candidate: stream==batch parity against cur_dsir_select's
registered oracle (order-free class), per-epoch model-drift snapshots
off the mergeable bucket-count log, and the restated-tail parity pin."""

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


def test_scores_from_state_matches_batch(spark):
    """The restated-tail trip-wire (module docstring): weights + Gumbel
    scores materialized from the feature log under the final model
    equal dsir_scores' fused batch path row-for-row. Since the r17
    fold both paths share `dsir.gumbel_perturbed_scores`, so this now
    guards the two weight-frame compositions (the plan-level
    byte-stability pin lives in tests/test_lm_fold.py)."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.dsir import dsir_scores
    from knowledge_graph_system_spark.registry import Ctx
    from knowledge_graph_system_spark.streaming.dsir_stream import (
        extract_batch,
        logratios_from_counts,
        scores_from_state,
    )

    docs = Ctx.get(spark, SF).tables["documents"]
    features, bucket_counts = extract_batch(docs)
    features = features.localCheckpoint(eager=True)
    got = sorted(
        map(
            tuple,
            scores_from_state(
                docs.select("doc_id", "source"),
                features,
                logratios_from_counts(bucket_counts),
            ).collect(),
        )
    )
    want = sorted(map(tuple, dsir_scores(docs).collect()))
    assert len(got) > 0 and got == want


def test_candidate_st_dsir_stream(spark):
    """Driver-style compare at BOTH gate scale factors: the streamed
    rollup equals cur_dsir_select's registered SQL verbatim — the real
    foreachBatch/availableNow path."""
    from knowledge_graph_system_spark.streaming.dsir_stream import (
        st_dsir_stream,
        st_dsir_stream_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, st_dsir_stream(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(st_dsir_stream_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_dsir_stream_batch_count_invariance(spark):
    """Order-free parity, directly: feature extraction is row-local,
    bucket counts are order-free sums, and the cut runs on the drained
    logs — 1-batch and 3-batch replays agree exactly."""
    from knowledge_graph_system_spark.streaming.dsir_stream import (
        streaming_dsir_select,
    )

    one = sorted(map(tuple, streaming_dsir_select(spark, SF, n_batches=1).collect()))
    three = sorted(map(tuple, streaming_dsir_select(spark, SF, n_batches=3).collect()))
    assert len(one) > 0 and one == three


def test_dsir_stream_epoch_model_drift(spark):
    """Per-epoch recalibration contract: the model summary comes from
    the accumulated <= epochs x B bucket-count log (no gram re-scan),
    bucket coverage is non-decreasing, and the log-ratio envelope is
    finite and ordered every epoch."""
    from knowledge_graph_system_spark.streaming.dsir_stream import (
        streaming_dsir_select,
    )

    stats: list = []
    streaming_dsir_select(spark, SF, n_batches=3, stats=stats)
    assert len(stats) == 3
    by_epoch = sorted(stats, key=lambda s: s["epoch"])
    cover = [s["n_buckets"] for s in by_epoch]
    assert cover == sorted(cover)
    for s in by_epoch:
        assert s["lr_min"] <= s["lr_max"]


def test_dsir_stream_state_is_features_not_text(spark):
    """The per-doc state the stream keeps is the hashed-feature log —
    ints and a flag, never the text column."""
    from knowledge_graph_system_spark.registry import Ctx
    from knowledge_graph_system_spark.streaming.dsir_stream import extract_batch

    docs = Ctx.get(spark, SF).tables["documents"]
    features, bucket_counts = extract_batch(docs.limit(5))
    assert features.columns == ["doc_id", "b", "c", "is_target"]
    assert bucket_counts.columns == ["b", "nt", "nr"]
    assert features.count() > 0
