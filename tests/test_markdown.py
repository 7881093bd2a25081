"""Markdown preprocessing (S3): parser block semantics + the reference's
chunk-grouping rules (`markdown_preprocessor.py:678-790`)."""

from __future__ import annotations

import pytest

from knowledge_graph_system_spark.functions.markdown import (
    parse_markdown_blocks,
    semantic_chunks,
)

_DOC = """# Title words here
intro prose line one
intro prose line two

```python
code_line = 1
another = 2
```
## Section Alpha
alpha body text
- item one
- item two
### Deep Dive
deep body text
```mermaid
graph TD
```
## Section Beta
beta body text
"""


@pytest.fixture(scope="module")
def blocks(spark):
    df = spark.createDataFrame([(1, _DOC)], "doc_id long, md string")
    rows = parse_markdown_blocks(df).collect()
    return sorted(rows, key=lambda r: r["block_no"])


def test_block_types_in_order(blocks):
    assert [r["block_type"] for r in blocks] == [
        "heading", "text", "code", "heading", "text", "list",
        "heading", "text", "mermaid", "heading", "text",
    ]


def test_code_language_and_level(blocks):
    code = [r for r in blocks if r["block_type"] in ("code", "mermaid")]
    assert [c["lang"] for c in code] == ["python", "mermaid"]
    heads = [r for r in blocks if r["block_type"] == "heading"]
    assert [h["level"] for h in heads] == [1, 2, 3, 2]


def test_breadcrumbs(blocks):
    path = {r["block_no"]: r["section_path"] for r in blocks}
    # body under "## Section Alpha"
    alpha_text = next(r for r in blocks if r["block_type"] == "text"
                      and "alpha" in r["text"])
    assert path[alpha_text["block_no"]] == "Title words here > Section Alpha"
    deep = next(r for r in blocks if "deep" in (r["text"] or ""))
    assert path[deep["block_no"]] == "Title words here > Section Alpha > Deep Dive"
    # Section Beta resets the level-3 crumb
    beta = next(r for r in blocks if "beta" in (r["text"] or ""))
    assert path[beta["block_no"]] == "Title words here > Section Beta"


def test_fence_markers_excluded_and_code_counted(blocks):
    py = next(r for r in blocks if r["block_type"] == "code")
    assert py["n_lines"] == 2  # the two code lines, not the fences


def test_unterminated_fence_runs_to_eof(spark):
    df = spark.createDataFrame(
        [(1, "# H words words\nprose line here\n```python\ncode to the end\nmore code")],
        "doc_id long, md string",
    )
    rows = {r["block_type"]: r for r in parse_markdown_blocks(df).collect()}
    assert rows["code"]["n_lines"] == 2


def _mk_blocks(spark, rows):
    """rows: (block_no, block_type, text)"""
    return spark.createDataFrame(
        [(1, n, t, x) for n, t, x in rows],
        "doc_id long, block_no int, block_type string, text string",
    )


def test_chunking_heading_boundary_and_order(spark):
    words = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    rows = [
        (1, "heading", "# " + words(5, "h")),
        (2, "text", words(30, "a")),
        (3, "heading", "## " + words(5, "g")),  # past target -> boundary
        (4, "text", words(10, "b")),
    ]
    out = sorted(
        semantic_chunks(_mk_blocks(spark, rows), target_words=20, max_words=100).collect(),
        key=lambda r: r["chunk_number"],
    )
    assert [r["boundary_type"] for r in out] == ["semantic", "end_of_document"]
    assert "g0" in out[1]["chunk_text"] and "b0" in out[1]["chunk_text"]


def test_chunking_strips_code_and_skips_tiny(spark):
    rows = [
        (1, "text", "one two three four five six"),
        (2, "code", "def f(): pass " * 10),
        (3, "mermaid", "graph TD a b c d e f"),
        (4, "text", "tiny"),  # <5 words -> skipped
        (5, "text", "seven eight nine ten eleven twelve"),
    ]
    out = semantic_chunks(_mk_blocks(spark, rows), target_words=50, max_words=100).collect()
    assert len(out) == 1
    assert "def f" not in out[0]["chunk_text"]
    assert "tiny" not in out[0]["chunk_text"]
    assert out[0]["word_count"] == 12


def test_chunking_hard_cut_giant_node(spark):
    giant = " ".join(f"w{i}" for i in range(120))
    out = sorted(
        semantic_chunks(
            _mk_blocks(spark, [(1, "text", giant)]), target_words=50, max_words=100
        ).collect(),
        key=lambda r: r["chunk_number"],
    )
    assert [r["boundary_type"] for r in out] == ["hard_cut"] * 3
    assert [r["word_count"] for r in out] == [50, 50, 20]
    assert [r["chunk_number"] for r in out] == [1, 2, 3]


def test_chunking_max_words_mid_section(spark):
    rows = [(i, "text", " ".join(f"x{i}_{j}" for j in range(40))) for i in range(1, 5)]
    out = semantic_chunks(
        _mk_blocks(spark, rows), target_words=60, max_words=70
    ).collect()
    assert all(r["word_count"] <= 70 for r in out)
    assert sum(r["word_count"] for r in out) == 160
