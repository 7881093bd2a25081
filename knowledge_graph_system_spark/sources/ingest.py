"""Ingestion dataflow (SURVEY.md §2.1 S1-S3, §2.11 U1/U2).

Reference pipeline: document → chunk → LLM concept extraction →
embedding → two-tier dedup-merge upsert into the graph
(`/root/reference/api/app/workers/ingestion_worker.py:174-520`,
`api/app/lib/llm_extractor.py:173-249`). The model calls are external
services there; tests use a deterministic mock provider
(`api/app/lib/mock_ai_provider.py`) — reproduced here as pure column
logic so the WHOLE dataflow is testable and scale-shaped:

  documents → chunk_by_count (F3, codegen)
            → mock_extract_concepts (U1: salient-term extraction)
            → deterministic embeddings (U2: md5-seeded unit vectors)
            → two-tier match against existing concepts (J9/V4 semantics)
            → upsert frame: matched rows merge, unmatched insert

On a real deployment the two mock stages swap for Arrow-batched
`mapInPandas` model calls (the multimodal module shows that plumbing);
everything else is unchanged. The output is a node/edge table pair
partitioned by id-hash — the write side of the 100 TB graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import chunk_by_count
from ..functions.vectors import dot_expr, with_unit_vec

STRICT_T = 0.5  # two-tier thresholds rescaled for the 16-dim test space
LABEL_T = 0.3   # (reference: 0.85 strict / 0.75+label, concept_matcher.py:48-49)


def mock_extract_concepts(chunks: DataFrame, min_len: int = 5) -> DataFrame:
    """U1 stand-in: 'concepts' = distinct salient terms (length ≥ min_len)
    per chunk, with a deterministic concept_id shaped like the
    reference's `sha256:<hash>_chunk<N>` ids (`ingestion.py:298`)."""
    return (
        chunks.select(
            "doc_id",
            "chunk_index",
            F.explode(F.array_distinct(F.split("chunk_text", " "))).alias("term"),
        )
        .filter(F.length("term") >= min_len)
        .withColumn(
            "concept_id",
            F.concat(
                F.lit("sha256:"),
                F.substring(F.sha2(F.col("term"), 256), 1, 12),
                F.lit("_chunk"),
                F.col("chunk_index").cast("string"),
            ),
        )
    )


def embed_concepts(concepts: DataFrame) -> DataFrame:
    """U2 stand-in: deterministic unit embedding seeded by the term."""
    return with_unit_vec(concepts, "term", out_col="embedding")


def two_tier_upsert(
    incoming: DataFrame, existing: DataFrame, strict_t: float = STRICT_T, label_t: float = LABEL_T
) -> DataFrame:
    """J9/V4 dedup-merge: best existing match per incoming concept —
    accept at sim ≥ strict_t, or sim ≥ label_t with equal term; matched
    rows become merges, the rest inserts. Returns the upsert frame with
    an `action` column ('merge' | 'insert')."""
    cand = existing.select(
        F.col("concept_id").alias("existing_id"),
        F.col("term").alias("existing_term"),
        F.col("embedding").alias("existing_emb"),
    )
    scored = (
        incoming.join(cand, how="cross")
        .withColumn("sim", F.round(dot_expr("embedding", "existing_emb"), 6))
        .filter(
            (F.col("sim") >= strict_t)
            | ((F.col("sim") >= label_t) & (F.col("term") == F.col("existing_term")))
        )
    )
    w = Window.partitionBy("concept_id", "doc_id", "chunk_index").orderBy(
        F.col("sim").desc(), F.col("existing_id")
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "chunk_index", "concept_id", "existing_id", "sim")
    )
    merged = incoming.join(best, ["doc_id", "chunk_index", "concept_id"], "left")
    return merged.select(
        "doc_id",
        "chunk_index",
        "concept_id",
        "term",
        "embedding",
        F.coalesce("existing_id", "concept_id").alias("resolved_id"),
        F.when(F.col("existing_id").isNotNull(), "merge").otherwise("insert").alias("action"),
    )


def ingest_documents(docs: DataFrame, existing: DataFrame | None = None) -> DataFrame:
    """S1 end-to-end batch: chunk → extract → embed → dedup-merge."""
    chunks = chunk_by_count(docs)
    concepts = embed_concepts(mock_extract_concepts(chunks))
    if existing is None:
        existing = concepts.limit(0)
    return two_tier_upsert(concepts, existing)


def batch_create(
    existing: DataFrame,
    new_concepts: DataFrame,
    mode: str = "auto",
) -> DataFrame:
    """S7 batch-create API semantics (`/root/reference/api/app/routes/
    graph.py:27-120`, `api/app/services/batch_service.py`): bulk concept
    upsert with label→ID resolution — `auto` reuses an existing concept
    on exact term match or embedding match (two-tier), `force_create`
    always inserts."""
    if mode == "force_create":
        return new_concepts.withColumn("resolved_id", F.col("concept_id")).withColumn(
            "action", F.lit("insert")
        )
    if mode != "auto":
        raise ValueError(f"mode must be auto|force_create, got {mode!r}")
    return two_tier_upsert(new_concepts, existing)
