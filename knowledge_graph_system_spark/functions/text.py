"""Text chunkers (SURVEY.md §2.9 F3) as pure column expressions.

Reference parity: word/sentence/paragraph chunkers with overlap
(`/root/reference/api/app/lib/chunker.py:55-231`,
`api/app/lib/source_chunker.py:82-314` — chunk_by_count:293). The
Spark form generates (chunk_index, chunk_text, start/end offsets) rows
via sequence+slice inside codegen — no UDF, so chunking 100 TB of text
is a flat map over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_by_count(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 20,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-word-count chunks (optionally
    overlapping): → (id, chunk_index, chunk_text, start_word, end_word)."""
    step = chunk_words - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_words")
    ws = F.split(F.col(text_col), " ")
    df = docs.withColumn("_ws", ws).withColumn(
        "chunk_index",
        F.explode(F.expr(f"sequence(0, greatest(0, cast(ceil((size(_ws) - {overlap}) / {step}.0) as int) - 1))")),
    )
    start = F.col("chunk_index") * step + 1  # slice() is 1-based
    return df.select(
        F.col(id_col),
        "chunk_index",
        F.array_join(F.slice("_ws", start, chunk_words), " ").alias("chunk_text"),
        (start - 1).alias("start_word"),
        F.least(start - 1 + chunk_words, F.size("_ws")).alias("end_word"),
    )


def chunk_sql(chunk_words: int = 20, step: int | None = None, max_chunks: int = 64) -> str:
    """DuckDB twin of `chunk_by_count` (no-overlap form unless step given).

    DuckDB 1.0 can't laterally parameterize generate_series bounds, so a
    fixed 0..max_chunks series is filtered by the doc's word count."""
    step = step or chunk_words
    return f"""
chunks AS (
  SELECT doc_id, g.i AS chunk_index,
         array_to_string(list_slice(ws, g.i * {step} + 1, g.i * {step} + {chunk_words}), ' ') AS chunk_text,
         g.i * {step} AS start_word,
         least(g.i * {step} + {chunk_words}, len(ws)) AS end_word
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
       generate_series(0, {max_chunks - 1}) AS g(i)
  WHERE g.i * {step} < len(ws) - {chunk_words - step}
)"""


def chunk_by_sentence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sentences_per_chunk: int = 3,
) -> DataFrame:
    """Sentence chunker (`source_chunker.py:166`): split on sentence
    boundaries, group N sentences per chunk. Codegen expressions only."""
    sents = F.split(F.col(text_col), r"(?<=[.!?])\s+")
    df = docs.withColumn("_s", sents).withColumn(
        "chunk_index",
        F.explode(
            F.expr(
                f"sequence(0, greatest(0, cast(ceil(size(_s) / {sentences_per_chunk}.0) as int) - 1))"
            )
        ),
    )
    start = F.col("chunk_index") * sentences_per_chunk + 1
    return df.select(
        F.col(id_col),
        "chunk_index",
        F.array_join(F.slice("_s", start, sentences_per_chunk), " ").alias("chunk_text"),
        F.size(F.slice("_s", start, sentences_per_chunk)).alias("n_sentences"),
    )


# --- markdown-aware chunking (S3, `markdown_preprocessor.py` analog) -------

import re as _re
from collections.abc import Iterator as _Iterator

import pandas as _pd

MD_CHUNK_SCHEMA = (
    "doc_id long, chunk_index int, section string, kind string, chunk_text string"
)


def _chunk_markdown_one(doc_id: int, text: str) -> list[tuple]:
    """Split one markdown document into semantic chunks: fenced code
    blocks stay intact (kind='code'); prose splits on blank lines under
    the nearest heading path (kind='text'). Deterministic."""
    out: list[tuple] = []
    section: list[str] = []
    idx = 0
    parts = _re.split(r"(```.*?```)", text, flags=_re.DOTALL)
    for part in parts:
        if not part.strip():
            continue
        if part.startswith("```"):
            out.append((doc_id, idx, " > ".join(section) or "(root)", "code", part.strip()))
            idx += 1
            continue
        for block in _re.split(r"\n\s*\n", part):
            block = block.strip()
            if not block:
                continue
            m = _re.match(r"^(#{1,6})\s+(.*)$", block.split("\n")[0])
            if m:
                level, title = len(m.group(1)), m.group(2).strip()
                section = section[: level - 1] + [title]
                body = "\n".join(block.split("\n")[1:]).strip()
                if not body:
                    continue
                block = body
            out.append((doc_id, idx, " > ".join(section) or "(root)", "text", block))
            idx += 1
    return out


def chunk_markdown(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """S3 markdown AST chunk-scan (`/root/reference/api/app/lib/
    markdown_preprocessor.py`): heading-path-aware chunks with code
    blocks kept whole — a mapInPandas stage in the ingest job (regex
    parsing is genuinely imperative; Arrow keeps it batched)."""

    def run(batches: _Iterator[_pd.DataFrame]) -> _Iterator[_pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                rows.extend(_chunk_markdown_one(int(doc_id), str(text)))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "chunk_index", "section", "kind", "chunk_text"]
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=MD_CHUNK_SCHEMA)
