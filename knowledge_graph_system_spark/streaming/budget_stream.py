"""Streaming token-budget-calibrated selection: score ARRIVING
training documents with a pre-trained quality classifier and keep the
best `_BUDGET_FRAC` of the corpus's tokens — the streaming form of
`operators/classifier.py::cur_budget_filter`, and the first streaming
SELECTION leg in the family (dedup and decontamination have had
batch+stream symmetry since r12/r13; VERDICT r14 next #8).

What is incremental and what is not — stated honestly:

- The CORPUS-SIZED work is per-trigger: tokenizing and scoring the
  arriving text (the wide `text` column never accumulates). Each
  micro-batch appends only a NARROW (doc_id, source, p, n_tokens)
  projection to the scored log — at 100 TB of text that log is ~1000x
  smaller than its corpus, and it is the ONLY state.
- The per-score token-MASS frame is mergeable by construction
  (mass(p) sums over any partition of the corpus), so each batch
  appends its own tiny (p, m) frame and the accumulated mass — hence
  the epoch's calibrated cut threshold — is a re-aggregation of a
  log bounded by epochs x distinct 6-dp scores, NEVER a re-scan of
  the scored docs (the `token_budget_filter` pass-1 bound argument,
  applied per epoch).
- The KEPT SET itself is not monotone: a document admitted early can
  be evicted when better documents arrive and fill the budget (the
  budget grows with total mass, but the competition grows faster at
  the top). So the per-epoch emission is the calibrated THRESHOLD
  (budget + boundary score) — an exact, consistent selection contract
  per epoch — and the doc-level cut is materialized from the narrow
  log when a consumer asks (here: once, after the replay drains, via
  the graded `token_budget_filter` itself). That final cut touches
  the narrow log only.
- Classifier weights are STATIC across the stream (trained once,
  broadcast) — exactly the classifier module's 100 TB contract ("the
  trained weights ship as a constant and the scan is the only cost").
  The replay harness trains them on the same static corpus the batch
  row trains on, which is what makes stream==batch parity EXACT: the
  streamed rollup equals `cur_budget_filter`'s registered SQL
  verbatim, the strongest oracle in the selection family.

Parity contract: scoring is row-local (doc -> p is a pure function of
the doc and the static weights) and mass/budget are order-free sums,
so the streamed union over ANY batch partitioning reproduces the
batch operator exactly — the contamination-stream class of parity (no
ordering precondition), not the span-dedup class (ascending replay).

Reference parity: the reference has no streaming-selection surface;
this extends its ingestion dataflow (`api/app/lib/age_client/
ingestion.py` epoch loop) the way the other st_* legs do.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.classifier import (
    _BUDGET_FRAC,
    _P_EXPR,
    _X_EXPR,
    _Y_EXPR,
    _w_frame,
    logreg_train,
    token_budget_filter,
)
from ..registry import Ctx
from .landing import dedup_cuts, stamp_landing_mtimes

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def score_batch(batch_docs: DataFrame, w_frame: DataFrame) -> DataFrame:
    """(doc_id, source, p, n_tokens): the narrow scored projection of
    one arriving batch — row-local off the broadcast weight frame, the
    only per-doc state the stream keeps (the text column dies with the
    trigger)."""
    return (
        batch_docs.select(
            "doc_id",
            "source",
            F.expr(_X_EXPR).alias("x"),
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
        .join(F.broadcast(w_frame))
        .select(
            "doc_id",
            "source",
            F.round(F.expr(_P_EXPR), 6).alias("p"),
            "n_tokens",
        )
    )


def epoch_threshold(mass_log: DataFrame, frac: float = _BUDGET_FRAC) -> dict:
    """Calibrate the cut from the ACCUMULATED mass log: budget
    b = floor(frac * total mass so far), threshold = the boundary
    score (the lowest p whose cumulative-from-the-top mass still
    intersects the budget). One aggregation + one tiny sorted collect
    over a frame bounded by epochs x distinct 6-dp scores — no scored
    -doc re-scan. Returns {"b": int, "threshold": float | None,
    "total": int}."""
    mass = (
        mass_log.groupBy("p")
        .agg(F.sum("m").cast("bigint").alias("m"))
        .orderBy(F.col("p").desc())
        .collect()
    )
    total = sum(r["m"] for r in mass)
    b = int(frac * total)
    cum = 0
    threshold = None
    for r in mass:
        if cum > b:
            break
        threshold = r["p"]
        cum += r["m"]
    return {"b": b, "threshold": threshold, "total": total}


def streaming_budget_select(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int = 3,
    frac: float = _BUDGET_FRAC,
    stats: list | None = None,
) -> DataFrame:
    """Replay the documents table as an availableNow file stream in
    `n_batches` ascending doc_id ranges; weights are trained ONCE on
    the static corpus (the batch row's training set — see the module
    docstring for why that is the deployment shape too). Each trigger
    appends the narrow scored projection and its per-batch mass frame;
    the epoch's calibrated threshold is derived from the accumulated
    mass log and (when `stats` is given) recorded per epoch. After the
    replay drains, the doc-level cut runs over the narrow log through
    the graded `token_budget_filter` and rolls up per source — the
    exact `cur_budget_filter` output.

    The tempfile.mkdtemp landing/log dirs are DRIVER-LOCAL by design
    (replay harness; a deployment points at an object store)."""
    tmp = tempfile.mkdtemp(prefix="kg_budget_stream_")
    landing = os.path.join(tmp, "landing")
    scored_dir = os.path.join(tmp, "scored")
    mass_dir = os.path.join(tmp, "mass")
    os.makedirs(landing)

    docs = Ctx.get(spark, sf_dir).tables["documents"]
    data = (
        docs.select("doc_id", "source", F.expr(_X_EXPR).alias("x"))
        .withColumn("y", F.expr(_Y_EXPR))
        .localCheckpoint(eager=True)
    )
    wf = _w_frame(spark, logreg_train(data)).localCheckpoint(eager=True)

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
        scored = score_batch(batch_df, wf)
        scored.write.mode("append").parquet(scored_dir)
        scored.groupBy("p").agg(
            F.sum("n_tokens").cast("bigint").alias("m")
        ).write.mode("append").parquet(mass_dir)
        if stats is not None:
            ep = epoch_threshold(spark.read.parquet(mass_dir), frac)
            ep["epoch"] = int(batch_id)
            stats.append(ep)

    try:
        q = (
            stream.writeStream.foreachBatch(handle)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        q.awaitTermination()
        scored_log = spark.read.parquet(scored_dir)
        bframe = (
            spark.read.parquet(mass_dir)
            .agg(F.floor(F.lit(frac) * F.sum("m")).cast("bigint").alias("b"))
        )
        kept = token_budget_filter(scored_log, bframe)
        return (
            kept.groupBy("source")
            .agg(
                F.count("*").alias("n_kept"),
                F.sum("n_tokens").cast("bigint").alias("kept_tokens"),
                F.sum(F.round(F.col("p") * 1000000).cast("bigint"))
                .cast("bigint")
                .alias("sum_p6"),
                F.min("p").alias("min_p"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def st_budget_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16 candidate: the streaming selection path graded hash-exact
    against cur_budget_filter's registered static oracle — the real
    foreachBatch/availableNow execution path, order-free stream==batch
    parity (scoring is row-local, mass is an order-free sum)."""
    return streaming_budget_select(spark, sf_dir, n_batches=3)


def st_budget_stream_oracle() -> str:
    from ..operators.classifier import cur_budget_filter_oracle

    return cur_budget_filter_oracle()


# Registered r16 (the pre-computed window's second new slot; probe-gated
# r15 — SCALE_NOTES r15 part 3: bare-session oracle MATCH, decade
# 1.28x; the registration also added `budget_stream` to load_all()'s
# streaming import list).
from ..registry import query  # noqa: E402

query("st_budget_stream", oracle=st_budget_stream_oracle())(st_budget_stream)
