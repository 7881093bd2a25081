"""Streaming BM25 index maintenance: ARRIVING documents folded into
the posting/length frames per trigger, ranking served from the merged
index — the streaming form of `operators/ranking.py::bm25_search`,
and the deployment shape of a continuously-updating lexical search
index (every crawl batch becomes searchable without a corpus rescan).

What is incremental and what drifts — stated honestly:

- The per-trigger work is the batch builders over ONLY the arriving
  documents: `build_postings` restricted to the serving vocabulary
  (postings = query-term hits, lengths = 1 narrow row/doc), appended
  to the index logs. Documents partition across batches, so the
  merged logs equal the batch-built frames EXACTLY — no merge
  aggregation is even needed, the union IS the index. (A production
  index persists FULL postings bucketed by term — build_postings'
  own contract; the graded row keeps the registered batch row's
  serving-vocabulary restriction so the parity claim is against its
  exact oracle.)
- BM25 scores are NOT per-doc-stable under ingest: idf and avgdl are
  corpus-global, so every document's score drifts as N grows — the
  classic "IDF drift" of incremental lexical indexes. The per-epoch
  emission is therefore the exact top-k snapshot over everything
  arrived so far (well-defined at every epoch, like the quantile
  stream), and the final snapshot equals the batch operator on the
  full corpus verbatim — `r_bm25_topk`'s registered oracle.
- Parity is ORDER-FREE: tf/dl are per-doc facts and df/N/avgdl are
  order-free sums over the union, so any batch partitioning yields
  the same final index and the same ranking.

Reference parity: the reference has no lexical ranker at all (the
BM25 family's module docstring); this extends the pipeline surface
the way the other six st_* legs do.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranking import _BM25_QUERY, bm25_from_postings, build_postings
from ..registry import Ctx
from .landing import dedup_cuts, stamp_landing_mtimes

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def streaming_bm25(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int = 3,
    stats: list | None = None,
) -> DataFrame:
    """Replay the documents table as an availableNow file stream in
    `n_batches` ascending doc_id ranges; each trigger appends the
    batch's posting/length frames; the final top-20 ranking runs over
    the merged index — equal to `r_bm25_topk` on the full corpus
    exactly. With `stats`, each epoch records its exact top-k snapshot
    (the IDF-drift observable)."""
    tmp = tempfile.mkdtemp(prefix="kg_bm25_stream_")
    landing = os.path.join(tmp, "landing")
    post_dir = os.path.join(tmp, "postings")
    len_dir = os.path.join(tmp, "lengths")
    os.makedirs(landing)

    docs = Ctx.get(spark, sf_dir).tables["documents"]
    probs = [i / n_batches for i in range(1, n_batches)]
    cuts = dedup_cuts(docs.stat.approxQuantile("doc_id", probs, 0.0)) if probs else []
    n_eff = len(cuts) + 1
    lo = None
    for i in range(n_eff):
        part = docs
        if lo is not None:
            part = part.filter(F.col("doc_id") > lo)
        if i < n_eff - 1:
            part = part.filter(F.col("doc_id") <= cuts[i])
            lo = cuts[i]
        bdir = os.path.join(landing, f"batch{i}")
        part.coalesce(1).write.mode("overwrite").parquet(bdir)
        stamp_landing_mtimes(bdir, i)

    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "batch*"))
    )

    def rank() -> DataFrame:
        return bm25_from_postings(
            spark.read.parquet(post_dir),
            spark.read.parquet(len_dir),
            _BM25_QUERY,
            top_k=20,
        )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        postings, lengths = build_postings(batch_df, vocabulary=_BM25_QUERY)
        postings.write.mode("append").parquet(post_dir)
        lengths.write.mode("append").parquet(len_dir)
        if stats is not None:
            snap = [tuple(r) for r in rank().collect()]
            stats.append({"epoch": int(batch_id), "topk": snap})

    try:
        q = (
            stream.writeStream.foreachBatch(handle)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        q.awaitTermination()
        return rank().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def st_bm25_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r18 candidate: the streaming lexical-index path graded
    hash-exact against r_bm25_topk's registered static oracle — the
    real foreachBatch/availableNow execution path, order-free
    stream==batch parity (per-doc facts union; global stats are
    order-free sums)."""
    return streaming_bm25(spark, sf_dir, n_batches=3)


def st_bm25_stream_oracle() -> str:
    from ..operators.ranking import bm25_sql

    return bm25_sql("documents", _BM25_QUERY, top_k=20)
