"""Streaming IVF ingest: ARRIVING vectors appended into the persisted
IVF index between offline rebuilds — the streaming form of the
living-index write path (`operators/ann.py::append_to_ivf_index`),
and the deployment shape of a continuously-ingesting vector store
(every embedding batch lands in the index without re-clustering).

Contract (the ann_ivf_lifecycle semantics, executed incrementally):
centroids are FROZEN from the last offline rebuild (here: the even-id
half, `build_ivf_index`); each arriving micro-batch is assigned to
its nearest frozen centroid and appended into ONLY the cell
partitions it lands in — one bounded centroid broadcast + a
partition-local write per trigger, no index rewrite, no shuffle of
the existing store. Search goes through the unchanged tombstone-aware
read path.

Parity is ORDER-FREE and exact: nearest-centroid assignment is a pure
per-vector function of the vector and the frozen centroid table, so
the final index content — and therefore the graded top-k — is
identical under ANY batch partitioning of the arrivals, equal to one
bulk append (the lifecycle row's own append step). The oracle is the
graded `ann_ivf_lifecycle` SQL with the delete step removed: even
half by label, odd half by argmax centroid cosine, probe + rerank.

What this adds over the batch lifecycle row: the real
foreachBatch/availableNow execution path with MULTIPLE append commits
against one partitioned store — the write pattern a continuously
ingesting deployment actually exercises (partition-dir append
visibility across commits, centroid-broadcast reuse per trigger).

Reference parity: extends the reference's ingestion dataflow
(`api/app/lib/age_client/ingestion.py` epoch loop) to the vector
index the way st_* legs do for dedup/decontamination/selection.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ann import (
    _QUERY_IDS,
    _vectors,
    append_to_ivf_index,
    build_ivf_index,
    ivf_topk_from_index,
)
from ..registry import Ctx
from .landing import dedup_cuts, stamp_landing_mtimes

_VEC_SCHEMA = "vec_id long, embedding array<float>, label int"


def streaming_ivf_ingest(
    spark: SparkSession, sf_dir: str, n_batches: int = 3
) -> DataFrame:
    """Seed the index from the even-id half (the offline rebuild),
    replay the odd-id half as an availableNow file stream in
    `n_batches` ascending vec_id ranges appending per trigger, then
    answer the standard queries through the persisted read path.
    Returns (query_id, vec_id, cos, rank) — the ANN family schema.

    The tempfile index/landing dirs are DRIVER-LOCAL by design (the
    ann_ivf_lifecycle harness note: single-JVM local mode; a real
    deployment points both at Hadoop-resolvable shared storage, which
    every index operation already supports)."""
    tmp = tempfile.mkdtemp(prefix="kg_ivf_stream_")
    landing = os.path.join(tmp, "landing")
    index_dir = os.path.join(tmp, "index")
    os.makedirs(landing)

    vecs = _vectors(Ctx.get(spark, sf_dir))
    queries = vecs.filter(F.col("vec_id").isin(_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    try:
        build_ivf_index(vecs.filter(F.col("vec_id") % 2 == 0), index_dir)

        # land the arrivals in ascending vec_id ranges (raw embeddings
        # table shape — the stream re-derives v like _vectors does)
        arrivals = Ctx.get(spark, sf_dir).tables["embeddings"].filter(
            F.col("vec_id") % 2 == 1
        )
        probs = [i / n_batches for i in range(1, n_batches)]
        cuts = (
            dedup_cuts(arrivals.stat.approxQuantile("vec_id", probs, 0.0))
            if probs
            else []
        )
        n_eff = len(cuts) + 1
        lo = None
        for i in range(n_eff):
            part = arrivals
            if lo is not None:
                part = part.filter(F.col("vec_id") > lo)
            if i < n_eff - 1:
                part = part.filter(F.col("vec_id") <= cuts[i])
                lo = cuts[i]
            bdir = os.path.join(landing, f"batch{i}")
            part.coalesce(1).write.mode("overwrite").parquet(bdir)
            stamp_landing_mtimes(bdir, i)

        stream = (
            spark.readStream.schema(_VEC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(landing, "batch*"))
        )

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            append_to_ivf_index(
                batch_df.select(
                    "vec_id",
                    "label",
                    F.expr("transform(embedding, x -> cast(x as double))").alias(
                        "v"
                    ),
                ),
                index_dir,
            )

        q = (
            stream.writeStream.foreachBatch(handle)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        q.awaitTermination()
        return ivf_topk_from_index(spark, index_dir, queries).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def st_ivf_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r17/r18 candidate: the streaming living-index write path graded
    hash-exact against the lifecycle semantics (append step, no
    delete) — the real foreachBatch/availableNow execution with
    multiple append commits, order-free parity by the pure per-vector
    assignment argument."""
    return streaming_ivf_ingest(spark, sf_dir, n_batches=3)


def st_ivf_ingest_stream_oracle() -> str:
    """The graded ann_ivf_lifecycle SQL with the tombstone-delete step
    removed (live = the full post-append store)."""
    from ..operators.ann import ann_ivf_lifecycle_oracle

    sql = ann_ivf_lifecycle_oracle()
    needle = "live AS (SELECT * FROM store WHERE vec_id % 17 <> 3)"
    assert needle in sql, "lifecycle oracle shape changed — update the stream twin"
    return sql.replace(needle, "live AS (SELECT * FROM store)")
