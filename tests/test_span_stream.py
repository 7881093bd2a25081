"""Streaming span dedup: incremental rewrite against the accumulated
gram-first index, exact parity with the batch operator under
ascending-range replay."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_r11_candidate_spandedup_stream(spark):
    """Driver-style compare for the prepared st_spandedup_stream row at
    BOTH gate scale factors: the foreachBatch/availableNow path graded
    hash-exact against cur_span_dedup's static SQL oracle (ascending
    doc_id ranges make every first-occurrence decision final)."""
    import duckdb

    from knowledge_graph_system_spark.streaming.span_stream import (
        st_spandedup_stream,
        st_spandedup_stream_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, st_spandedup_stream(spark, sf).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(
            map(tuple, con.execute(st_spandedup_stream_oracle()).fetchall())
        )
        con.close()
        assert len(got) > 0 and got == want
        assert sum(r[3] for r in got) > 0  # the stream actually removed spans


def test_cross_batch_span_attribution(spark, tmp_path):
    """The index path, isolated: a span first seen in batch 0 is
    removed from a batch-1 arrival (cross-batch), a batch-1-internal
    duplicate also dedups, and the gram store holds exactly one row
    per distinct gram with the batch-0 occurrence as first."""
    from knowledge_graph_system_spark.streaming.span_stream import (
        process_span_batch,
    )

    gram_dir = str(tmp_path / "grams")
    out_dir = str(tmp_path / "out")
    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    b0 = spark.createDataFrame(
        [(1, f"a0 {span} a1"), (2, "unrelated words only in this doc here now")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(10, f"b0 b1 {span}"), (11, f"c0 {span} c1"), (12, "w1 w2 w3")],
        "doc_id long, text string",
    )
    process_span_batch(b0, gram_dir, out_dir, n=8)
    process_span_batch(b1, gram_dir, out_dir, n=8)

    out = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    # batch 0: canonical occurrence untouched
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0
    # batch 1: BOTH later arrivals lose the span (cross-batch via index)
    assert out[10]["clean_text"] == "b0 b1" and out[10]["n_removed"] == 8
    assert out[11]["clean_text"] == "c0 c1" and out[11]["n_removed"] == 8
    assert out[12]["n_removed"] == 0

    # store: one row per distinct gram; the span gram's first is doc 1
    store = spark.read.parquet(gram_dir)
    assert store.groupBy("gram").count().filter(F.col("count") > 1).count() == 0
    row = store.filter(F.col("gram") == span).collect()
    assert len(row) == 1 and row[0]["doc_id"] == 1 and row[0]["start"] == 1
