"""Streaming shard sink (streaming/shard_stream.py) — prepared r20
registry candidate: stream==batch parity against cur_shard_manifest's
registered oracle (order-free class), append-mode file granularity,
and manifest-from-log exactness."""

from __future__ import annotations

import os

import duckdb

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _oracle_rows(sql: str, sf: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_candidate_st_shard_stream(spark):
    """Driver-style compare at BOTH gate scale factors: the streamed
    sink's manifest (with its disk-vs-log match flags) equals
    cur_shard_manifest's registered SQL verbatim — the real
    foreachBatch/availableNow path."""
    from knowledge_graph_system_spark.streaming.shard_stream import (
        st_shard_stream,
        st_shard_stream_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, st_shard_stream(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(st_shard_stream_oracle(), sf)))
        assert len(got) == 8 and got == want


def test_shard_stream_batch_count_invariance(spark):
    """Order-free parity, directly: membership is row-local, the
    accounting log is an order-free sum — 1-batch and 3-batch replays
    agree exactly."""
    from knowledge_graph_system_spark.streaming.shard_stream import (
        streaming_shard_write,
    )

    one = sorted(
        map(tuple, streaming_shard_write(spark, SF, n_batches=1).collect())
    )
    three = sorted(
        map(tuple, streaming_shard_write(spark, SF, n_batches=3).collect())
    )
    assert len(one) == 8 and one == three


def test_shard_stream_file_granularity(spark, tmp_path):
    """The documented append-mode contract: each trigger adds at most
    one file per (shard, slot), so after k triggers a slot directory
    holds <= k task-owned files — never a per-row explosion — and the
    manifest log stays <= triggers x n_shards rows."""
    from knowledge_graph_system_spark.operators.curation import greedy_pack
    from knowledge_graph_system_spark.registry import Ctx
    from knowledge_graph_system_spark.streaming.shard_stream import (
        manifest_from_log,
        write_shard_batch,
    )

    docs = Ctx.get(spark, SF).tables["documents"]
    packed = greedy_pack(docs, seq_len=1024, n_groups=16).localCheckpoint(
        eager=True
    )
    data_dir = str(tmp_path / "data")
    mlog_dir = str(tmp_path / "mlog")
    halves = [
        packed.filter(F.col("doc_id") % 2 == 0),
        packed.filter(F.col("doc_id") % 2 == 1),
    ]
    for h in halves:
        write_shard_batch(h, data_dir, mlog_dir, n_shards=4, files_per_shard=2)
    for d in sorted(os.listdir(data_dir)):
        if not d.startswith("shard="):
            continue
        for s in sorted(os.listdir(f"{data_dir}/{d}")):
            if not s.startswith("slot="):
                continue
            files = [
                f
                for f in os.listdir(f"{data_dir}/{d}/{s}")
                if f.endswith(".parquet")
            ]
            assert 1 <= len(files) <= 2, (d, s, files)
    mlog = spark.read.parquet(mlog_dir)
    assert mlog.count() <= 2 * 4
    # the folded manifest accounts for every sequence and token
    m = {r["shard"]: (r["n_seqs"], r["n_tokens"])
         for r in manifest_from_log(mlog).collect()}
    assert sum(v[0] for v in m.values()) == packed.count()
    assert (
        sum(v[1] for v in m.values())
        == packed.agg(F.sum("n_tokens")).collect()[0][0]
    )
