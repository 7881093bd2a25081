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
