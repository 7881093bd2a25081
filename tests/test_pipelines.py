"""End-to-end curation pipeline: the user-facing chain of graded
operators (exact dedup → near-dup → span rewrite → quality cut →
decontaminate → temperature mix → BPE pack → epoch order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _run(spark):
    from knowledge_graph_system_spark.pipelines.curate import curate_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 25 == 0)
    tr = docs.filter(F.col("doc_id") % 25 != 0)
    return curate_corpus(spark, tr, ev)


def test_curate_corpus_end_to_end(spark):
    """The chain runs, every stage accounts for its rows, the dedup and
    filter stages only shrink, the mix may grow, and the final frame
    carries the full pack + epoch-order contract."""
    res = _run(spark)
    stages = {name: (i, o) for name, i, o in res.report}
    assert set(stages) == {
        "exact_dedup", "near_dedup", "span_dedup", "quality_cut",
        "decontaminate", "temperature_mix", "bpe_pack", "epoch_order",
    }
    # stage chaining: each stage's rows_in == previous stage's rows_out
    for (_, _, o), (_, i, _) in zip(res.report, res.report[1:]):
        assert i == o
    for name in ("exact_dedup", "near_dedup", "quality_cut", "decontaminate"):
        i, o = stages[name]
        assert o <= i
    assert stages["near_dedup"][1] > stages["near_dedup"][0] - stages["near_dedup"][1], \
        "near-dedup should remove some but not most rows"
    assert stages["span_dedup"][0] == stages["span_dedup"][1]  # rewrite, not filter

    out = res.packed
    for c in ("pack_key", "doc_id", "source", "text", "pack_group",
              "bin_id", "bin_offset", "spans_boundary", "shard", "pos"):
        assert c in out.columns
    rows = out.collect()
    assert len(rows) == res.report[-1][2] > 0
    # epoch order: dense positions per shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # bin offsets respect the budget
    assert all(0 <= r["bin_offset"] < 2048 for r in rows)


def test_curate_corpus_shard_sink(spark, tmp_path):
    """VERDICT r16 next #4: with shards_path set the pipeline ends at
    the training-shard sink — the written manifest accounts for
    EXACTLY the rows epoch_order emits, per epoch_order's OWN shard
    membership (no re-hash), and the shard files carry the same
    sequences and BPE-token budgets."""
    from knowledge_graph_system_spark.pipelines.curate import curate_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 25 == 0)
    tr = docs.filter(F.col("doc_id") % 25 != 0)
    path = str(tmp_path / "pipe_shards")
    res = curate_corpus(
        spark, tr, ev, shards_path=path, files_per_shard=2
    )
    assert res.manifest is not None
    got = sorted(map(tuple, res.manifest.collect()))
    # re-derive the accounting from the epoch-ordered frame itself
    want = sorted(
        map(
            tuple,
            res.packed.groupBy("shard")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0
    # ... and from the files on disk (membership honored, not re-hashed)
    from_files = sorted(
        map(
            tuple,
            spark.read.parquet(f"{path}/data")
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            )
            .collect(),
        )
    )
    assert from_files == want
    assert sum(r[1] for r in got) == res.report[-1][2]


def test_curate_corpus_deterministic(spark):
    """Two runs over the same input produce byte-identical output —
    every stage keys off content hashes, no RNG anywhere."""
    a = sorted(map(tuple, _run(spark).packed.collect()))
    b = sorted(map(tuple, _run(spark).packed.collect()))
    assert a == b and len(a) > 0


def test_r12_candidate_pipe_curation_graded(spark):
    """Driver-style compare for the prepared pipe_curation_graded row
    at BOTH gate scale factors — the full curation chain (exact dedup
    → MinHash/LSH/CC near-dedup → span rewrite → quantile cut →
    decontamination → temperature mix → whitespace-budget pack →
    epoch order) in one hash compare — plus the invariants that make
    the row non-trivial: the planted negative-id clones WIN their
    exact-dedup groups and surface in the final rows (stage 1 provably
    reshapes the output), upsampled sources carry mix_copy > 0
    replicas, and the trainer-facing (shard, pos) order is a dense
    permutation."""
    import duckdb

    from knowledge_graph_system_spark.pipelines.curate import (
        pipe_curation_graded,
        pipe_curation_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = pipe_curation_graded(spark, sf).collect()
        got = sorted(tuple(r) for r in rows)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(map(tuple, con.execute(pipe_curation_oracle()).fetchall()))
        con.close()
        assert len(got) > 0 and got == want
        assert any(r["doc_id"] < 0 for r in rows)
        assert any(r["mix_copy"] > 0 for r in rows)
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) <= set(range(4))
        for poss in by_shard.values():
            assert sorted(poss) == list(range(len(poss)))
