"""Streaming DSIR importance resampling: the streaming twin of
`operators/dsir.py::cur_dsir_select`, completing batch+stream symmetry
for the THIRD selection form (global budget -> budget_stream.py,
stratified -> stratified_stream.py, importance resampling -> here) —
symmetry leg NINE in the streaming family.

What is incremental and what is not — stated honestly:

- The CORPUS-SIZED work is per-trigger: tokenizing the arriving text
  into hashed-bigram buckets and evaluating the row-local teacher flag
  (the wide `text` column dies with the trigger).
- The accumulated per-doc state is the HASHED-FEATURE log
  (doc_id, b, c, is_target) — the paper's own compact representation:
  at most min(_GRAM_CAP, _B) rows per document of three ints and a
  bool, vs kilobytes of text. Plus a 1-row-per-doc (doc_id, source)
  dimension log for the rollup.
- The importance MODEL is mergeable by construction: per-bucket
  (nt, nr) gram counts sum over any partition of the corpus, so each
  batch appends its own <= _B-row count frame and the epoch's
  log-ratio frame — hence every document's would-be weight — is a
  re-aggregation of a log bounded by epochs x _B rows. The per-epoch
  emission is that recalibrated model (the lr drift is the
  observable, the bm25_stream IDF-drift discipline); doc weights
  CHANGE as the raw/target distributions drift, which is exactly why
  the final materialization recomputes w from the feature log under
  the DRAINED model rather than freezing early weights.
- Selection (Gumbel top-_KEEP_FRAC) runs once after the drain, over
  the feature log only, through the graded `token_budget_filter` —
  the exact `cur_dsir_select` output.

Parity class: order-free (the contamination/budget class) — feature
extraction is row-local, bucket counts are order-free sums, Gumbel
noise is a pure function of doc_id, and the final cut runs on the
drained logs, so ANY batch partitioning reproduces the batch operator.
The one accepted caveat shared with EVERY graded ln-carrying row: w
sums floats whose partition order differs run-to-run even in batch;
the 4-dp round absorbs the ULPs (operators/lm.py:27-31).

The score/select tail shares its Gumbel and rollup expressions with
dsir_scores through `dsir.gumbel_perturbed_scores` (folded r17, when
cur_dsir_select sat in the must-record tail — the schedule the r16
module docstring carried). Pinned by
tests/test_dsir_stream.py::test_scores_from_state_matches_batch plus
the normalized-plan byte-stability pin in tests/test_lm_fold.py.

Reference parity: the reference has no data-selection surface; this
extends its ingestion dataflow (`api/app/lib/age_client/ingestion.py`
epoch loop) the way the other st_* legs do.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classifier import token_budget_filter
from ..operators.dsir import (
    _ALPHA,
    _B,
    _KEEP_FRAC,
    _W_DP,
    doc_gram_buckets,
    gumbel_perturbed_scores,
)
from ..registry import Ctx
from .landing import dedup_cuts, stamp_landing_mtimes

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def extract_batch(batch_docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(features, bucket_counts) for one arriving batch — the only
    state the stream keeps (plus the 1-row-per-doc dimension log).
    features = (doc_id, b, c, is_target); bucket_counts = (b, nt, nr),
    at most _B rows per trigger."""
    grams = doc_gram_buckets(batch_docs)
    features = grams.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        # is_target is a per-DOC flag (the teacher evaluates the whole
        # document), constant across the doc's gram rows
        F.max("is_target").alias("is_target"),
    )
    bucket_counts = features.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("nt"),
        F.sum("c").cast("bigint").alias("nr"),
    )
    return features, bucket_counts


def logratios_from_counts(bucket_log: DataFrame) -> DataFrame:
    """(b, lr) from the ACCUMULATED per-bucket count log — the same
    Laplace-smoothed formula as dsir_logratios, re-aggregated from a
    frame bounded by epochs x _B rows (no gram re-scan)."""
    per_b = bucket_log.groupBy("b").agg(
        F.sum("nt").cast("bigint").alias("nt"),
        F.sum("nr").cast("bigint").alias("nr"),
    )
    tot = per_b.agg(F.sum("nt").alias("T"), F.sum("nr").alias("R"))
    return per_b.join(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("nt") + F.lit(_ALPHA)) / (F.col("T") + F.lit(_ALPHA * _B)))
            - F.log((F.col("nr") + F.lit(_ALPHA)) / (F.col("R") + F.lit(_ALPHA * _B)))
        ).alias("lr"),
    )


def scores_from_state(
    docs_log: DataFrame, features: DataFrame, lrs: DataFrame
) -> DataFrame:
    """(doc_id, source, w, score) from the drained logs under the
    final model — dsir_scores' arithmetic on the feature log (w sums
    c * lr per bucket instead of lr per gram occurrence; equal sums,
    and the 4-dp round is the shared ULP discipline). The Gumbel/
    rollup tail renders once in `dsir.gumbel_perturbed_scores` (the
    r17 fold the module docstring scheduled); the parity pin keeps the
    composition honest."""
    w = (
        features.join(F.broadcast(lrs), "b")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("lr")), _W_DP).alias("w"))
    )
    return gumbel_perturbed_scores(docs_log, w)


def streaming_dsir_select(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int = 3,
    stats: list | None = None,
) -> DataFrame:
    """Replay the documents table as an availableNow file stream in
    `n_batches` ascending doc_id ranges. Each trigger appends the
    batch's hashed-feature log, its <= _B-row bucket-count frame, and
    the (doc_id, source) dimension rows; when `stats` is given, the
    epoch's recalibrated model summary (T, R, the extreme log-ratios)
    is recorded per epoch — model drift made observable. After the
    replay drains, weights materialize from the feature log under the
    final model and the Gumbel top-_KEEP_FRAC cut rolls up per source
    — the exact `cur_dsir_select` output.

    The tempfile.mkdtemp landing/log dirs are DRIVER-LOCAL by design
    (replay harness; a deployment points at an object store)."""
    tmp = tempfile.mkdtemp(prefix="kg_dsir_stream_")
    landing = os.path.join(tmp, "landing")
    feat_dir = os.path.join(tmp, "features")
    bucket_dir = os.path.join(tmp, "buckets")
    docs_dir = os.path.join(tmp, "docs")
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

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        features, bucket_counts = extract_batch(batch_df)
        features.write.mode("append").parquet(feat_dir)
        bucket_counts.write.mode("append").parquet(bucket_dir)
        batch_df.select("doc_id", "source").write.mode("append").parquet(docs_dir)
        if stats is not None:
            lrs = logratios_from_counts(spark.read.parquet(bucket_dir))
            row = lrs.agg(
                F.count(F.lit(1)).alias("n_buckets"),
                F.round(F.min("lr"), _W_DP).alias("lr_min"),
                F.round(F.max("lr"), _W_DP).alias("lr_max"),
            ).collect()[0]
            stats.append(
                {
                    "epoch": int(batch_id),
                    "n_buckets": row["n_buckets"],
                    "lr_min": row["lr_min"],
                    "lr_max": row["lr_max"],
                }
            )

    try:
        q = (
            stream.writeStream.foreachBatch(handle)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        q.awaitTermination()
        features = spark.read.parquet(feat_dir)
        lrs = logratios_from_counts(spark.read.parquet(bucket_dir))
        scored = scores_from_state(
            spark.read.parquet(docs_dir), features, lrs
        ).localCheckpoint(eager=True)
        bframe = scored.agg(
            F.floor(F.lit(_KEEP_FRAC) * F.count(F.lit(1))).cast("bigint").alias("b")
        )
        kept = token_budget_filter(
            scored.withColumn("n_tokens", F.lit(1).cast("bigint")),
            bframe,
            token_col="n_tokens",
            score_col="score",
            key="doc_id",
        )

        def _sum4(col: str):
            return F.sum(F.round(F.col(col) * 10000).cast("bigint")).cast("bigint")

        return (
            kept.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_sel"),
                _sum4("w").alias("sum_w4"),
                _sum4("score").alias("sum_score4"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def st_dsir_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r19 candidate (prepared r16): the streaming importance-
    resampling path graded hash-exact against cur_dsir_select's
    registered static oracle — the real foreachBatch/availableNow
    execution path, order-free stream==batch parity."""
    return streaming_dsir_select(spark, sf_dir, n_batches=3)


def st_dsir_stream_oracle() -> str:
    from ..operators.dsir import cur_dsir_select_oracle

    return cur_dsir_select_oracle()
