"""Streaming grid-quantile telemetry (streaming/quantile_stream.py) —
prepared r17 registry candidate: stream==batch parity against
smp_grid_quantiles' registered oracle (plain-sum counters commute, so
the parity is order-free) and exact per-epoch snapshots."""

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


def test_r17_candidate_st_grid_quantiles_stream(spark):
    """Driver-style compare at BOTH gate scale factors: the streamed
    quantile frame equals smp_grid_quantiles' registered SQL
    verbatim."""
    from knowledge_graph_system_spark.streaming.quantile_stream import (
        st_grid_quantiles_stream,
        st_grid_quantiles_stream_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, st_grid_quantiles_stream(spark, sf).collect()))
        want = sorted(
            map(tuple, _oracle_rows(st_grid_quantiles_stream_oracle(), sf))
        )
        assert len(got) > 0 and got == want


def test_gq_stream_batch_count_invariance(spark):
    """Plain-sum counters commute: 1-batch and 3-batch replays agree
    exactly."""
    from knowledge_graph_system_spark.streaming.quantile_stream import (
        streaming_grid_quantiles,
    )

    one = sorted(map(tuple, streaming_grid_quantiles(spark, SF, n_batches=1).collect()))
    three = sorted(
        map(tuple, streaming_grid_quantiles(spark, SF, n_batches=3).collect())
    )
    assert len(one) > 0 and one == three


def test_gq_stream_epoch_snapshots_are_exact(spark):
    """Each epoch's snapshot equals the batch operator over exactly
    the documents arrived by that epoch (ascending doc_id replay), and
    the final snapshot covers every (source, q) cell of the full-corpus
    answer."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.sampling import grid_quantiles
    from knowledge_graph_system_spark.registry import Ctx
    from knowledge_graph_system_spark.streaming.quantile_stream import (
        streaming_grid_quantiles,
    )

    stats: list = []
    final = sorted(
        map(
            tuple,
            streaming_grid_quantiles(spark, SF, n_batches=3, stats=stats).collect(),
        )
    )
    assert len(stats) == 3
    docs = Ctx.get(spark, SF).tables["documents"]
    cuts = docs.stat.approxQuantile("doc_id", [1 / 3, 2 / 3], 0.0)
    by_epoch = sorted(stats, key=lambda s: s["epoch"])
    for i, s in enumerate(by_epoch):
        pref = docs if i >= 2 else docs.filter(F.col("doc_id") <= cuts[i])
        want = {
            (r["source"], r["q"]): r["gq"]
            for r in grid_quantiles(
                pref,
                "n_chars",
                [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)],
                lo=0,
                hi=4096,
                bins=256,
                group="source",
            ).collect()
        }
        assert s["quantiles"] == want
    assert sorted((src, q, v) for (src, q), v in by_epoch[-1]["quantiles"].items()) == final
