"""Incremental streaming LSH near-dup: batch-operator parity and
incremental semantics (cross-batch detection, index admission order)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.dedup import d_minhash_lsh
from knowledge_graph_system_spark.streaming.dedup_stream import streaming_near_dup
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def stream_pairs(spark):
    return streaming_near_dup(spark, SF_DIR, n_batches=2).collect()


def test_stream_matches_batch_operator(spark, stream_pairs):
    """Same corpus, incremental computation → identical pair set
    (no band crosses the cap at this sf, so parity is exact)."""
    got = sorted((r["doc_a"], r["doc_b"], r["jaccard"]) for r in stream_pairs)
    want = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in d_minhash_lsh(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0


def test_cross_batch_pairs_found_via_index(stream_pairs):
    """Docs split odd/even across the two batches: pairs with mixed
    parity can only be found by the batch-vs-index join, and they must
    be attributed to the LATER doc's batch (detection at arrival)."""
    by_pair = {(r["doc_a"], r["doc_b"]): r["batch_id"] for r in stream_pairs}
    cross = {p: b for p, b in by_pair.items() if p[0] % 2 != p[1] % 2}
    assert len(cross) > 0
    # even docs land in batch 0, odd in batch 1 → every cross pair is
    # detected when its odd member arrives
    assert set(cross.values()) == {1}


def test_within_batch_pairs_attributed_to_own_batch(stream_pairs):
    by_pair = {(r["doc_a"], r["doc_b"]): r["batch_id"] for r in stream_pairs}
    same0 = {p for p in by_pair if p[0] % 2 == 0 and p[1] % 2 == 0}
    same1 = {p for p in by_pair if p[0] % 2 == 1 and p[1] % 2 == 1}
    assert all(by_pair[p] == 0 for p in same0)
    assert all(by_pair[p] == 1 for p in same1)
    assert same0 or same1  # the corpus plants near-dups of both parities


def test_no_duplicate_pair_rows(stream_pairs):
    """A pair is emitted exactly once: index admission happens after
    detection, so a doc never re-pairs with itself or re-reports."""
    pairs = [(r["doc_a"], r["doc_b"]) for r in stream_pairs]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)


def test_dedup_within_watermark_bounds_state(spark, tmp_path):
    """A duplicate key within the watermark window is dropped; a
    duplicate far past it (state evicted) is re-admitted."""
    import datetime as dt
    import os
    import time
    import uuid

    from knowledge_graph_system_spark.streaming.dedup_stream import (
        stream_dedup_within_watermark,
    )

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)

    def write(sub, rows):
        spark.createDataFrame(rows, "k string, ts timestamp").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / sub))
        time.sleep(1.1)

    # batch 0: first occurrences; batch 1: near-duplicate of 'a' (dropped)
    # plus an event 1h later that advances the watermark far past 'a';
    # batch 2: unrelated key — state eviction applies at the batch's
    # state commit, so the advanced watermark evicts 'a' HERE, one
    # trigger after it advanced; batch 3: 'a' again -> re-admitted
    write("b=0", [("a", t0), ("b", t0 + dt.timedelta(seconds=30))])
    write("b=1", [("a", t0 + dt.timedelta(minutes=2)),
                  ("w", t0 + dt.timedelta(hours=1))])
    write("b=2", [("c", t0 + dt.timedelta(hours=1, seconds=30))])
    write("b=3", [("a", t0 + dt.timedelta(hours=1, minutes=1))])

    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "b=*"))
    )
    sink = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        stream_dedup_within_watermark(stream, ["k"], "ts", "10 minutes")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["k"], r["ts"]) for r in spark.sql(f"SELECT * FROM {sink}").collect()
    )
    ks = [k for k, _ in rows]
    assert ks.count("a") == 2          # original + post-eviction re-admit
    assert ks.count("b") == 1 and ks.count("w") == 1 and ks.count("c") == 1
    a_times = [ts for k, ts in rows if k == "a"]
    assert t0 in a_times and t0 + dt.timedelta(minutes=2) not in a_times


def test_cap_count_input_is_batch_bounded(spark):
    """The rows the cap count (and cross join) can see are the semi-
    joined batch-relevant slice of the band store — FLAT as the index
    grows, not O(history). Simulate 4 index generations: each adds
    1000 rows of never-again-seen bands plus a constant 8-band overlap
    with the incoming batch; the relevant slice must stay constant
    while the store quadruples."""
    from knowledge_graph_system_spark.streaming.dedup_stream import _relevant_bands

    batch = spark.range(16).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.concat(F.lit("b0|shared"), (F.col("id") % 8).cast("string")).alias("band"),
    )
    store_rows, seen = [], []
    for gen in range(4):
        noise = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit(f"b1|gen{gen}_"), F.col("id").cast("string")).alias("band"),
        )
        overlap = spark.range(8).select(
            (F.col("id") + gen * 100).alias("doc_id"),
            F.concat(F.lit("b0|shared"), F.col("id").cast("string")).alias("band"),
        )
        store_rows.append(noise.unionByName(overlap))
        store = store_rows[0]
        for s in store_rows[1:]:
            store = store.unionByName(s)
        seen.append(_relevant_bands(store, batch).count())
    assert seen == [8, 16, 24, 32]  # grows with OVERLAP rows only
    # the store itself grew 1008 -> 4032: relevant rows track the
    # 8-per-generation overlap, not the 1000-per-generation noise


def test_relevant_bands_semi_join_is_broadcast(spark):
    from knowledge_graph_system_spark.streaming.dedup_stream import _relevant_bands

    store = spark.range(100).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("band")
    )
    batch = spark.range(10).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("band")
    )
    plan = _relevant_bands(store, batch)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_r9_candidate_neardup_stream(spark):
    """Driver-style compare for the prepared st_neardup_stream row: the
    STREAMED pair set must hash-match the static LSH SQL oracle."""
    import duckdb

    from knowledge_graph_system_spark.streaming.dedup_stream import (
        st_neardup_stream,
        st_neardup_stream_oracle,
    )
    from tests.conftest import SF_DIR

    got = sorted(map(tuple, st_neardup_stream(spark, SF_DIR).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(st_neardup_stream_oracle()).fetchall()))
    con.close()
    assert len(got) > 0 and got == want
