"""Streaming BM25 index maintenance (streaming/bm25_stream.py) —
prepared r18 registry candidate: stream==batch parity against
r_bm25_topk's registered oracle (order-free: per-doc facts union,
global stats are order-free sums) and exact per-epoch snapshots that
make IDF drift observable."""

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


def test_r18_candidate_st_bm25_stream(spark):
    """Driver-style compare at BOTH gate scale factors: the merged
    streamed index serves the exact r_bm25_topk ranking."""
    from knowledge_graph_system_spark.streaming.bm25_stream import (
        st_bm25_stream,
        st_bm25_stream_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = [tuple(r) for r in st_bm25_stream(spark, sf).collect()]
        want = [tuple(r) for r in _oracle_rows(st_bm25_stream_oracle(), sf)]
        assert len(got) > 0 and got == want  # ORDERED compare: top-k


def test_bm25_stream_batch_count_invariance(spark):
    """Any batch partitioning yields the same merged index and the
    same ranking: 1-batch vs 3-batch replays agree exactly (ordered)."""
    from knowledge_graph_system_spark.streaming.bm25_stream import streaming_bm25

    one = [tuple(r) for r in streaming_bm25(spark, SF, n_batches=1).collect()]
    three = [tuple(r) for r in streaming_bm25(spark, SF, n_batches=3).collect()]
    assert len(one) > 0 and one == three


def test_bm25_stream_epoch_snapshots_show_idf_drift(spark):
    """Each epoch's snapshot equals the batch operator over exactly
    the documents arrived by that epoch (ascending doc_id replay) —
    i.e. scores legitimately DRIFT as N/avgdl/df grow, and every
    intermediate ranking is exact on what has arrived."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.ranking import (
        _BM25_QUERY,
        bm25_search,
    )
    from knowledge_graph_system_spark.registry import Ctx
    from knowledge_graph_system_spark.streaming.bm25_stream import streaming_bm25

    stats: list = []
    final = [tuple(r) for r in streaming_bm25(spark, SF, n_batches=3, stats=stats).collect()]
    assert len(stats) == 3
    docs = Ctx.get(spark, SF).tables["documents"]
    cuts = docs.stat.approxQuantile("doc_id", [1 / 3, 2 / 3], 0.0)
    by_epoch = sorted(stats, key=lambda s: s["epoch"])
    for i, s in enumerate(by_epoch):
        pref = docs if i >= 2 else docs.filter(F.col("doc_id") <= cuts[i])
        want = [tuple(r) for r in bm25_search(pref, _BM25_QUERY, top_k=20).collect()]
        assert s["topk"] == want
    assert by_epoch[-1]["topk"] == final
