"""The full training-corpus curation pipeline as ONE composition.

Every stage is an already-oracle-graded operator from the library; this
module is the user-facing chain a reference user would actually run to
turn a raw document table into packed, epoch-ordered training data:

    raw documents
      → exact dedup            (keep first per content hash)
      → near-dup dedup         (MinHash-LSH → CC groups → apply)
      → span dedup rewrite     (Lee-et-al duplicated-span removal)
      → quality cut            (global quantile on a quality score)
      → decontamination        (drop docs sharing n-grams with eval)
      → temperature mix        (flatten group shares ∝ natural^α)
      → greedy pack            (BPE-token-budgeted sequences)
      → epoch order            (deterministic per-epoch shard+pos)

Determinism: every stage keys off content hashes, so two runs over the
same input produce byte-identical output (pinned by test). Scale: the
chain introduces no operator not already plan-audited — the stages'
shuffles are documented at their definitions; this module only wires
DataFrames together (no collects beyond the stages' own documented
bounded ones: BPE vocab head, temperature group counts, the GK
quantile aggregate).

Stage accounting is returned alongside the data: (stage, rows_in,
rows_out) per stage, computed with one count per stage boundary —
pipeline observability, the first thing an operator asks of a corpus
build ("where did my rows go?").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class CurationResult:
    packed: DataFrame            # doc-level: pack/bin/order columns
    report: list[tuple[str, int, int]]  # (stage, rows_in, rows_out)


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    *,
    span_n: int = 8,
    keep_frac: float = 0.75,
    alpha: float = 0.5,
    n_merges: int = 24,
    seq_len: int = 2048,
    n_groups: int = 8,
    epoch: int = 1,
    n_shards: int = 8,
) -> CurationResult:
    """Run the full curation chain over (doc_id, text, source, n_chars).

    `eval_docs` (same shape) drives decontamination; None skips that
    stage. Returns the packed, epoch-ordered corpus plus the per-stage
    row accounting."""
    from ..operators.bpe import bpe_token_counts, learn_bpe
    from ..operators.components import connected_components, dedup_apply
    from ..operators.curation import (
        contamination_check,
        greedy_pack,
        span_dedup_apply,
    )
    from ..operators.dedup import (
        JACCARD_THRESHOLD,
        doc_shingles,
        lsh_candidates,
        minhash_signatures,
        verify_jaccard,
    )
    from ..operators.sampling import (
        epoch_order,
        quantile_filter_global,
        temperature_mix,
    )

    report: list[tuple[str, int, int]] = []

    def stage(name: str, before: DataFrame, after: DataFrame) -> DataFrame:
        # localCheckpoint: each stage's output feeds both the count and
        # the next stage — without it the whole chain re-executes per
        # count and the lineage grows past analysis budgets
        out = after.localCheckpoint(eager=True)
        report.append((name, before.count(), out.count()))
        return out

    cur = docs.select("doc_id", "text", "source", "n_chars")

    # 1. exact dedup: keep the first doc per content hash
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    cur = stage(
        "exact_dedup",
        cur,
        cur.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn"),
    )

    # 2. near-dup dedup: LSH pairs → CC groups → anti-join apply
    sh = doc_shingles(cur).localCheckpoint(eager=True)
    pairs = verify_jaccard(lsh_candidates(minhash_signatures(sh)), sh).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    groups = comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("group_id"),
        (F.col("node") == F.col("comp")).alias("keeper"),
    )
    cur = stage("near_dedup", cur, dedup_apply(cur, groups))

    # 3. span dedup rewrite: texts replaced by their cleaned form
    cleaned = span_dedup_apply(cur, n=span_n)
    cur = stage(
        "span_dedup",
        cur,
        cur.drop("text", "n_chars")
        .join(cleaned.select("doc_id", "clean_text"), "doc_id")
        .withColumnRenamed("clean_text", "text")
        .withColumn("n_chars", F.length("text").cast("bigint")),
    )

    # 4. quality cut: global quantile on doc length post-cleaning
    cur = stage(
        "quality_cut", cur, quantile_filter_global(cur, "n_chars", keep_frac)
    )

    # 5. decontamination: drop training docs sharing spans with eval
    if eval_docs is not None:
        hits = contamination_check(cur, eval_docs, n=span_n).select("doc_id")
        cur = stage("decontaminate", cur, cur.join(hits, "doc_id", "left_anti"))

    # 6. temperature mix: flatten source shares (mix_copy keeps replicas
    # distinct downstream; the pack key must include it)
    mixed = temperature_mix(cur, "source", "doc_id", alpha=alpha)
    mixed = mixed.withColumn(
        "pack_key", F.concat_ws("#", F.col("doc_id"), F.col("mix_copy"))
    )
    cur = stage("temperature_mix", cur, mixed)

    # 7. greedy pack under tokenizer-real BPE budgets
    merges = learn_bpe(cur, n_merges=n_merges)
    counts = bpe_token_counts(cur.select("pack_key", "text"),
                              merges, id_col="pack_key")
    budgeted = cur.join(
        counts.select(F.col("doc_id").alias("pack_key"), "n_bpe_tokens"),
        "pack_key",
    )
    packed = greedy_pack(
        budgeted,
        seq_len=seq_len,
        n_groups=n_groups,
        tokens_col=F.col("n_bpe_tokens"),
        id_col="pack_key",
    ).withColumnRenamed("doc_id", "pack_key")
    cur = stage(
        "bpe_pack",
        cur,
        cur.join(
            packed.select(
                "pack_key", "pack_group", "bin_id", "bin_offset", "spans_boundary"
            ),
            "pack_key",
        ),
    )

    # 8. deterministic per-epoch order
    cur = stage(
        "epoch_order", cur, epoch_order(cur, "pack_key", epoch, n_shards)
    )
    return CurationResult(packed=cur, report=report)
