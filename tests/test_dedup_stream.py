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
