"""Chunker contracts (F3/S3): full coverage, overlap, markdown structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_graph_system_spark.functions.text import (
    chunk_by_count,
    chunk_by_sentence,
    chunk_markdown,
)


def test_chunk_by_count_covers_everything(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(47)))], "doc_id long, text string"
    )
    chunks = chunk_by_count(docs, chunk_words=20).orderBy("chunk_index").collect()
    assert [c["chunk_index"] for c in chunks] == [0, 1, 2]
    rebuilt = " ".join(c["chunk_text"] for c in chunks)
    assert rebuilt == docs.collect()[0]["text"]  # lossless, no overlap
    assert chunks[-1]["end_word"] == 47


def test_chunk_by_count_overlap(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30)))], "doc_id long, text string"
    )
    chunks = chunk_by_count(docs, chunk_words=10, overlap=5).orderBy("chunk_index").collect()
    # stride 5: chunk k starts at word 5k
    for k, c in enumerate(chunks):
        assert c["chunk_text"].split(" ")[0] == f"w{5 * k}"
    # consecutive chunks share exactly 5 words
    a, b = chunks[0]["chunk_text"].split(), chunks[1]["chunk_text"].split()
    assert a[5:] == b[:5]


def test_chunk_by_sentence(spark):
    text = "One. Two! Three? Four. Five."
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = chunk_by_sentence(docs, sentences_per_chunk=2).orderBy("chunk_index").collect()
    assert [c["chunk_text"] for c in chunks] == ["One. Two!", "Three? Four.", "Five."]
    assert [c["n_sentences"] for c in chunks] == [2, 2, 1]


def test_chunk_markdown_structure(spark):
    md = (
        "# Title\n\nIntro paragraph.\n\n## Sub\n\nBody one.\n\nBody two.\n\n"
        "```python\nx = 1\n\ny = 2\n```\n\n# Next\n\nTail."
    )
    docs = spark.createDataFrame([(1, md)], "doc_id long, text string")
    chunks = chunk_markdown(docs).orderBy("chunk_index").collect()
    kinds = [(c["kind"], c["section"]) for c in chunks]
    assert ("code", "Title > Sub") in kinds          # code block intact, under heading path
    code = [c for c in chunks if c["kind"] == "code"][0]
    assert "x = 1" in code["chunk_text"] and "y = 2" in code["chunk_text"]
    assert [c["section"] for c in chunks if c["kind"] == "text"] == [
        "Title",
        "Title > Sub",
        "Title > Sub",
        "Next",
    ]
