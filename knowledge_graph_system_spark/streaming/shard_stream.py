"""Streaming training-shard sink: the streaming twin of
`sources/shards.py::write_training_shards` + `cur_shard_manifest`,
completing batch+stream symmetry for the pipeline's FINAL step —
symmetry leg TEN in the streaming family (ingest, dedup, span-dedup,
contamination, windows, budget, stratified, DSIR, quantiles, and now
the sink itself).

What is incremental and what is not — stated honestly:

- PACKING is per-corpus-build, not per-trigger: greedy_pack's bin
  boundaries are a prefix-sum over the hash-ordered corpus, so packing
  arriving docs incrementally would diverge from the batch packer.
  The stream therefore packs ONCE on the static corpus (exactly the
  stratified leg's once-trained LM stance: "computed once per corpus
  build") and streams the WRITE — which is the part a 100 TB ingest
  actually streams: sequences arrive, files append, the manifest
  stays exact without ever rescanning data.
- Per trigger: shard/slot membership is the row-local md5 fold
  (engine-portable, order-free), the batch's rows APPEND into their
  (shard, slot) directories, and the trigger's tiny (shard, n_seqs,
  n_tokens) accounting frame appends to a MANIFEST LOG — the only
  accumulated state, bounded by triggers x n_shards rows.
- After the drain, the manifest materializes as a re-aggregation of
  the log (mergeable sums — the sketch/quantile-cell discipline) and
  is verified two ways in the graded frame itself: against the batch
  assigner's accounting (the oracle side) and against a re-derivation
  from the FILES on disk (the persisted-artifact side), exactly
  `cur_shard_manifest`'s contract.
- File granularity: append-mode writes produce up to ONE file per
  (shard, slot) per trigger — n_triggers x files_per_shard files per
  shard, each task-owned (no tiny-files explosion beyond trigger
  granularity; a deployment compacts shards offline, which is an
  fs-level concern the manifest is immune to by construction).

Parity class: order-free (the budget/DSIR class) — membership is a
pure row-local function, accounting is an order-free sum, and the
final frame reads the drained log + files, so ANY batch partitioning
reproduces the batch operator exactly (pinned by the 1-vs-3-batch
invariance test).

Reference parity: the reference has no training-sink surface; this
extends its ingestion dataflow the way the other st_* legs do.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import hash_bucket
from ..registry import Ctx
from ..sources.shards import manifest_of, shard_assign
from .landing import dedup_cuts, stamp_landing_mtimes

_PACKED_SCHEMA = (
    "doc_id long, n_tokens bigint, pack_group bigint, bin_id bigint, "
    "bin_offset bigint, spans_boundary boolean"
)


def write_shard_batch(
    batch_df: DataFrame,
    data_dir: str,
    mlog_dir: str,
    n_shards: int,
    files_per_shard: int = 2,
    key: str = "doc_id",
    salt: str = "shard",
) -> None:
    """One trigger: row-local (shard, slot) assignment (the batch
    writer's exact md5 folds), append the rows into their directories,
    append the trigger's accounting frame to the manifest log."""
    sharded = shard_assign(batch_df, n_shards, key, salt)
    slot = (hash_bucket(F.col(key), salt + "#file") % files_per_shard).cast(
        "bigint"
    )
    (
        sharded.withColumn("slot", slot)
        .repartition(n_shards * files_per_shard, F.col("shard"), F.col("slot"))
        .write.mode("append")
        .partitionBy("shard", "slot")
        .parquet(data_dir)
    )
    manifest_of(sharded).write.mode("append").parquet(mlog_dir)


def manifest_from_log(mlog: DataFrame) -> DataFrame:
    """(shard, n_seqs, n_tokens) from the accumulated per-trigger
    accounting log — mergeable sums, no data rescan."""
    return mlog.groupBy("shard").agg(
        F.sum("n_seqs").cast("bigint").alias("n_seqs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


def streaming_shard_write(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int = 3,
    n_shards: int = 8,
    files_per_shard: int = 2,
) -> DataFrame:
    """Pack the corpus once (the per-corpus-build step), replay the
    packed sequences as an availableNow file stream in `n_batches`
    ascending doc_id ranges, append each trigger into the shard layout
    + manifest log, then return the drained manifest joined with a
    re-derivation from the written files (match flags included) — the
    exact `cur_shard_manifest` output shape and values.

    The tempfile.mkdtemp landing/data dirs are DRIVER-LOCAL by design
    (replay harness; a deployment points at an object store)."""
    from ..operators.curation import greedy_pack

    tmp = tempfile.mkdtemp(prefix="kg_shard_stream_")
    landing = os.path.join(tmp, "landing")
    data_dir = os.path.join(tmp, "data")
    mlog_dir = os.path.join(tmp, "mlog")
    os.makedirs(landing)

    docs = Ctx.get(spark, sf_dir).tables["documents"]
    packed = greedy_pack(docs, seq_len=1024, n_groups=16).localCheckpoint(
        eager=True
    )

    probs = [i / n_batches for i in range(1, n_batches)]
    cuts = (
        dedup_cuts(packed.stat.approxQuantile("doc_id", probs, 0.0))
        if probs
        else []
    )
    n_eff = len(cuts) + 1
    lo = None
    for i in range(n_eff):
        part = packed
        if lo is not None:
            part = part.filter(F.col("doc_id") > lo)
        if i < n_eff - 1:
            part = part.filter(F.col("doc_id") <= cuts[i])
            lo = cuts[i]
        bdir = os.path.join(landing, f"batch{i}")
        part.coalesce(1).write.mode("overwrite").parquet(bdir)
        stamp_landing_mtimes(bdir, i)

    stream = (
        spark.readStream.schema(_PACKED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "batch*"))
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        write_shard_batch(
            batch_df, data_dir, mlog_dir, n_shards, files_per_shard
        )

    try:
        q = (
            stream.writeStream.foreachBatch(handle)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        q.awaitTermination()
        manifest = manifest_from_log(spark.read.parquet(mlog_dir))
        from_files = (
            spark.read.parquet(data_dir)
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_seqs_files"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens_files"),
            )
        )
        return (
            manifest.join(from_files, "shard")
            .select(
                "shard",
                "n_seqs",
                "n_tokens",
                (F.col("n_seqs") == F.col("n_seqs_files")).alias("seqs_match"),
                (F.col("n_tokens") == F.col("n_tokens_files")).alias(
                    "tokens_match"
                ),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def st_shard_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r20 candidate (prepared r17): the streaming shard-sink path
    graded hash-exact against cur_shard_manifest's registered static
    oracle — the real foreachBatch/availableNow execution path,
    order-free stream==batch parity (row-local membership, mergeable
    accounting, files re-derivation)."""
    return streaming_shard_write(spark, sf_dir, n_batches=3)


def st_shard_stream_oracle() -> str:
    from ..sources.shards import cur_shard_manifest_oracle

    return cur_shard_manifest_oracle()
