"""Streaming IVF ingest (streaming/ivf_stream.py) — prepared r17/r18
registry candidate: the living-index write path under real
foreachBatch execution, graded against the lifecycle append semantics
(order-free parity: nearest-frozen-centroid assignment is a pure
per-vector function)."""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _oracle_rows(sql: str, sf: str):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_r17_candidate_st_ivf_ingest_stream(spark):
    """Driver-style compare at BOTH gate scale factors: seed build +
    streamed appends + persisted-path search == the lifecycle SQL
    minus the delete."""
    from knowledge_graph_system_spark.streaming.ivf_stream import (
        st_ivf_ingest_stream,
        st_ivf_ingest_stream_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, st_ivf_ingest_stream(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(st_ivf_ingest_stream_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_ivf_stream_batch_count_invariance(spark):
    """Nearest-frozen-centroid assignment is per-vector, so the final
    index — and the graded top-k — is identical under any batch
    partitioning of the arrivals."""
    from knowledge_graph_system_spark.streaming.ivf_stream import (
        streaming_ivf_ingest,
    )

    one = sorted(map(tuple, streaming_ivf_ingest(spark, SF, n_batches=1).collect()))
    three = sorted(map(tuple, streaming_ivf_ingest(spark, SF, n_batches=3).collect()))
    assert len(one) > 0 and one == three


def test_ivf_stream_appends_touch_only_landed_cells(spark, tmp_path):
    """The per-trigger write is partition-local: appending one batch
    creates files ONLY under the cell dirs its vectors assign to (the
    no-index-rewrite claim, checked on the filesystem)."""
    import os

    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.ann import (
        _vectors,
        append_to_ivf_index,
        build_ivf_index,
    )
    from knowledge_graph_system_spark.registry import Ctx

    vecs = _vectors(Ctx.get(spark, SF))
    index_dir = str(tmp_path / "idx")
    build_ivf_index(vecs.filter(F.col("vec_id") % 2 == 0), index_dir)

    def file_set():
        out = set()
        for root, _dirs, files in os.walk(f"{index_dir}/vectors"):
            for f in files:
                if f.endswith(".parquet"):
                    out.add(os.path.join(root, f))
        return out

    before = file_set()
    batch = vecs.filter(F.col("vec_id") % 2 == 1).limit(5)
    append_to_ivf_index(batch, index_dir)
    new_files = file_set() - before
    assert new_files, "append wrote nothing"
    # every pre-existing file is untouched and every new file sits
    # under a cell= partition dir
    assert before <= file_set()
    assert all("/cell=" in f for f in new_files)
