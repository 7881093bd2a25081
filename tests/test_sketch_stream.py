"""Streaming HLL maintenance: exact batch/stream register parity and
bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.sketches import hll_distinct
from knowledge_graph_system_spark.streaming.sketch_stream import (
    streaming_distinct_estimate,
)
from tests.conftest import SF_DIR


def test_stream_estimate_equals_batch(spark):
    """Register max is order-free, so the incrementally maintained
    estimate must equal the batch operator on the whole corpus
    bit-for-bit — the sketch-parity analog of streaming_near_dup's
    pair parity."""
    got = sorted(
        map(tuple, streaming_distinct_estimate(spark, SF_DIR, n_batches=3).collect())
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    want = sorted(map(tuple, hll_distinct(words, "w", ["source"]).collect()))
    assert got == want and len(got) > 0


def test_stream_state_is_bounded(spark, tmp_path):
    """State rows never exceed |groups| x 256 no matter how many
    batches flow."""
    import os

    from knowledge_graph_system_spark.streaming.sketch_stream import (
        merge_batch_registers,
    )

    state = str(tmp_path / "regs")
    os.makedirs(state)
    sizes = []
    for i in range(4):
        batch = spark.range(i * 2000, (i + 1) * 2000).select(
            (F.col("id") % 3).cast("string").alias("g"),
            F.col("id").cast("string").alias("v"),
        )
        merge_batch_registers(batch, "v", ["g"], state)
        sizes.append(spark.read.parquet(state).count())
    assert all(s <= 3 * 256 for s in sizes)
    assert sizes[-1] >= sizes[0]  # registers only fill in


def test_cms_stream_state_equals_batch(spark, tmp_path):
    """Counts add across batches: 4 disjoint micro-batches merged
    incrementally give the exact whole-corpus sketch."""
    import os

    from knowledge_graph_system_spark.operators.cms import cms_sketch
    from knowledge_graph_system_spark.streaming.sketch_stream import (
        merge_batch_cms,
    )

    state = str(tmp_path / "cms")
    os.makedirs(state)
    whole = spark.range(8000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 700).cast("string").alias("v"),
    )
    for i in range(4):
        merge_batch_cms(
            whole.filter(F.col("id") % 4 == i), "v", ["g"], state
        )
    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    want = sorted(map(tuple, cms_sketch(whole, "v", ["g"]).collect()))
    assert got == want


def test_r9_candidate_hll_stream(spark):
    """Driver-style compare for the prepared st_hll_stream row: the
    STREAMED register state's estimates must hash-match the static
    DuckDB sketch twin (stream == batch bit-exact, batch == SQL)."""
    import duckdb

    from knowledge_graph_system_spark.streaming.sketch_stream import (
        st_hll_stream,
        st_hll_stream_oracle,
    )
    from tests.conftest import SF_DIR

    got = sorted(map(tuple, st_hll_stream(spark, SF_DIR).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(st_hll_stream_oracle()).fetchall()))
    con.close()
    assert len(got) > 0 and got == want


def test_r9_candidate_cms_stream(spark):
    """Driver-style compare for the prepared st_cms_stream row: the
    STREAMED counter state's estimates must hash-match t_cms_words'
    static all-integer SQL twin (sum-merge is order-insensitive)."""
    import duckdb

    from knowledge_graph_system_spark.streaming.sketch_stream import (
        st_cms_stream,
        st_cms_stream_oracle,
    )
    from tests.conftest import SF_DIR

    got = sorted(map(tuple, st_cms_stream(spark, SF_DIR).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(st_cms_stream_oracle()).fetchall()))
    con.close()
    assert len(got) == 20 and got == want
