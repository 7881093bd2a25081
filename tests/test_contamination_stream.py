"""Streaming decontamination (streaming/contamination_stream.py) —
prepared r12 registry candidate: the real foreachBatch/availableNow
path graded against cur_contamination's registered static oracle."""

from __future__ import annotations

import duckdb


def _oracle_rows(sql: str, sf: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_r12_candidate_st_contamination_stream(spark):
    """Driver-style compare at BOTH gate scale factors: the streamed
    union equals the static batch oracle exactly (stream-static join,
    stateless per batch — parity needs no ordering precondition)."""
    from knowledge_graph_system_spark.streaming.contamination_stream import (
        st_contamination_stream,
        st_contamination_stream_oracle,
    )

    oracle = st_contamination_stream_oracle()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, st_contamination_stream(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(oracle, sf)))
        assert len(got) > 0 and got == want


def test_contamination_stream_partition_free(spark):
    """The verdict for a doc depends only on that doc and the static
    eval set, so the batch partitioning must not matter: 2-batch and
    3-batch replays produce identical results."""
    from knowledge_graph_system_spark.streaming.contamination_stream import (
        streaming_contamination,
    )

    sf = "/root/testdata/sf0.001"
    two = sorted(map(tuple, streaming_contamination(spark, sf, n_batches=2).collect()))
    three = sorted(map(tuple, streaming_contamination(spark, sf, n_batches=3).collect()))
    assert two == three and len(two) > 0
