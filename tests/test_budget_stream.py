"""Streaming token-budget selection (streaming/budget_stream.py) —
prepared r16 registry candidate: stream==batch parity against
cur_budget_filter's registered oracle (the contamination-stream
order-free parity class), per-epoch threshold calibration off the
accumulated mass log, and the narrow-state contract."""

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


def test_r16_candidate_st_budget_stream(spark):
    """Driver-style compare at BOTH gate scale factors: the streamed
    rollup equals cur_budget_filter's registered SQL verbatim — the
    real foreachBatch/availableNow path."""
    from knowledge_graph_system_spark.streaming.budget_stream import (
        st_budget_stream,
        st_budget_stream_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, st_budget_stream(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(st_budget_stream_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_budget_stream_batch_count_invariance(spark):
    """Order-free parity claim, directly: scoring is row-local and
    mass is an order-free sum, so ANY batch partitioning yields the
    same final selection — 1-batch and 3-batch replays agree
    exactly."""
    from knowledge_graph_system_spark.streaming.budget_stream import (
        streaming_budget_select,
    )

    one = sorted(map(tuple, streaming_budget_select(spark, SF, n_batches=1).collect()))
    three = sorted(map(tuple, streaming_budget_select(spark, SF, n_batches=3).collect()))
    assert len(one) > 0 and one == three


def test_budget_stream_epoch_thresholds(spark):
    """Each epoch's calibrated threshold equals the batch-side cut
    over exactly the documents that have ARRIVED by that epoch
    (prefix-of-corpus parity): the lowest score whose
    cumulative-from-the-top token mass still intersects
    floor(frac * arrived mass). Also pins that the threshold comes
    from the accumulated MASS LOG, not a doc re-scan: the stats rows
    carry the accumulated totals, which must be non-decreasing and end
    at the full corpus mass."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.classifier import (
        _BUDGET_FRAC,
        _X_EXPR,
        _Y_EXPR,
        logreg_score,
        logreg_train,
    )
    from knowledge_graph_system_spark.registry import Ctx
    from knowledge_graph_system_spark.streaming.budget_stream import (
        streaming_budget_select,
    )

    stats: list = []
    streaming_budget_select(spark, SF, n_batches=3, stats=stats)
    assert len(stats) == 3
    totals = [s["total"] for s in sorted(stats, key=lambda s: s["epoch"])]
    assert totals == sorted(totals)

    # batch-side reference: per-doc (doc_id, p, n_tokens), scored once
    docs = Ctx.get(spark, SF).tables["documents"]
    data = (
        docs.select("doc_id", "source", F.expr(_X_EXPR).alias("x"))
        .withColumn("y", F.expr(_Y_EXPR))
        .localCheckpoint(eager=True)
    )
    w = logreg_train(data)
    scored = (
        logreg_score(data, w)
        .join(
            docs.select(
                "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("nt")
            ),
            "doc_id",
        )
        .select("doc_id", "p", "nt")
        .collect()
    )
    rows = sorted(((r["doc_id"], r["p"], r["nt"]) for r in scored))

    def prefix_threshold(sub):
        total = sum(nt for _, _, nt in sub)
        b = int(_BUDGET_FRAC * total)
        mass: dict = {}
        for _, p, nt in sub:
            mass[p] = mass.get(p, 0) + nt
        cum, thr = 0, None
        for p in sorted(mass, reverse=True):
            if cum > b:
                break
            thr = p
            cum += mass[p]
        return total, b, thr

    # the replay batches ascending doc_id thirds; epoch e has seen the
    # prefix of stats[e]["total"] tokens — recover each prefix by
    # walking doc_ids in ascending order until the totals match
    by_epoch = sorted(stats, key=lambda s: s["epoch"])
    for s in by_epoch:
        pref = []
        acc = 0
        for doc_id, p, nt in rows:
            if acc >= s["total"]:
                break
            pref.append((doc_id, p, nt))
            acc += nt
        total, b, thr = prefix_threshold(pref)
        assert acc == s["total"]
        assert b == s["b"]
        assert thr == s["threshold"]
    assert by_epoch[-1]["total"] == sum(nt for _, _, nt in rows)


def test_budget_stream_state_is_narrow(spark):
    """The only per-doc state the stream keeps is the 4-column scored
    projection — no text column survives the trigger."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.classifier import (
        _X_EXPR,
        _Y_EXPR,
        _w_frame,
        logreg_train,
    )
    from knowledge_graph_system_spark.registry import Ctx
    from knowledge_graph_system_spark.streaming.budget_stream import score_batch

    docs = Ctx.get(spark, SF).tables["documents"]
    data = (
        docs.select("doc_id", "source", F.expr(_X_EXPR).alias("x"))
        .withColumn("y", F.expr(_Y_EXPR))
        .localCheckpoint(eager=True)
    )
    wf = _w_frame(spark, logreg_train(data))
    out = score_batch(docs.limit(5), wf)
    assert out.columns == ["doc_id", "source", "p", "n_tokens"]
    assert out.count() == 5
