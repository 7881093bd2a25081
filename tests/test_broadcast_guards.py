"""Counted-broadcast guards (functions/scale.py:maybe_broadcast).

Three rounds each found one forced broadcast of a data-proportional
frame (r8 IVF tombstones, r9 LM count frames, r10 Cypher shortestPath
frontier), so r10 closed the class with a full-site audit (see
SCALE_NOTES): every remaining data-proportional site now counts before
hinting. Each test pins BOTH halves of the contract, the
tests/test_ann.py::test_tombstone_broadcast_guard pattern:
  1. hint-drop — past the threshold the analyzed plan loses the hint
     (the planner/AQE decides, which is the correct open-data plan);
  2. row identity — the fallback path returns exactly the hinted
     path's rows (the guard changes strategy, never semantics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_maybe_broadcast_unit(spark):
    from knowledge_graph_system_spark.functions.scale import maybe_broadcast

    df = spark.range(5).toDF("k")
    probe = spark.range(5).toDF("k")
    hinted = probe.join(maybe_broadcast(df, max_rows=10), "k")
    bare = probe.join(maybe_broadcast(df, max_rows=2), "k")
    assert "broadcast" in _analyzed(hinted)
    assert "broadcast" not in _analyzed(bare)
    # a caller-supplied count skips the count job and is honored
    assert "broadcast" in _analyzed(maybe_broadcast(df, 10, n_rows=3))
    assert _rows(hinted) == _rows(bare)


def test_a14_idf_guard(spark, monkeypatch):
    from knowledge_graph_system_spark.operators import aggregates

    hinted = aggregates.a14_tfidf_naming(spark, SF_DIR)
    n_hints = _analyzed(hinted).count("broadcast")
    monkeypatch.setattr(aggregates, "IDF_BROADCAST_MAX", 0)
    bare = aggregates.a14_tfidf_naming(spark, SF_DIR)
    assert _analyzed(bare).count("broadcast") == n_hints - 1
    assert _rows(bare) == _rows(hinted)


def test_bpe_vocab_guard(spark, monkeypatch):
    from knowledge_graph_system_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "aa ab aa"), (2, "ab ba aa aa"), (3, "ba ba")],
        "doc_id long, text string",
    )
    merges = [("a", "a"), ("a", "b")]
    hinted = bpe.bpe_token_counts(docs, merges)
    assert "broadcast" in _analyzed(hinted)
    monkeypatch.setattr(bpe, "VOCAB_BROADCAST_MAX", 0)
    bare = bpe.bpe_token_counts(docs, merges)
    assert "broadcast" not in _analyzed(bare)
    assert _rows(bare) == _rows(hinted)


def test_range_join_band_guard(spark, monkeypatch):
    from knowledge_graph_system_spark.operators import asof

    left = spark.range(200).select((F.col("id") * 3.7).alias("v"))
    bands = spark.createDataFrame(
        [("lo", 0.0, 250.0), ("hi", 250.0, 740.0)], "band string, lo double, hi double"
    )
    hinted = asof.range_join(left, "v", bands, bucket_width=25.0)
    assert "broadcast" in _analyzed(hinted)
    monkeypatch.setattr(asof, "BAND_BROADCAST_MAX", 0)
    bare = asof.range_join(left, "v", bands, bucket_width=25.0)
    assert "broadcast" not in _analyzed(bare)
    assert _rows(bare) == _rows(hinted)


def test_annealing_moved_guard(spark, monkeypatch):
    from knowledge_graph_system_spark.operators import annealing

    hinted = annealing.execute_proposals(spark, SF_DIR)
    n_hints = _analyzed(hinted).count("broadcast")
    monkeypatch.setattr(annealing, "MOVED_BROADCAST_MAX", 0)
    bare = annealing.execute_proposals(spark, SF_DIR)
    assert _analyzed(bare).count("broadcast") == n_hints - 1
    assert _rows(bare) == _rows(hinted)
