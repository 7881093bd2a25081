"""Markdown preprocessing (S3 depth): block AST, heading breadcrumbs,
semantic chunking.

Reference parity — `/root/reference/api/app/lib/markdown_preprocessor.py`:
- block AST with types heading/code/mermaid/json/yaml/list/text
  (`BlockType`, `:24-34`; fence-language classification `:378-390`);
- semantic chunk grouping: skip <5-word nodes, finalize at heading
  boundaries once past the target word count, finalize when max would
  be exceeded, hard-cut giant single nodes, boundary types
  semantic/hard_cut/end_of_document (`group_ast_to_semantic_chunks`,
  `:678-790`);
- code is stripped from prose chunks (`_strip_code_from_prose`,
  `:537`): here code-family blocks are excluded from chunk text (the
  mock-translation analog — no LLM in this container).

Spark-first shape: the PARSER is pure window/column algebra — fence
state is a cumulative parity over fence-marker lines, block boundaries
are kind-transitions, breadcrumbs are windowed max-structs — so it
scales to any corpus and has an exact DuckDB twin for the oracle. Only
the sequential chunk accumulator (inherently stateful per document)
runs in applyInPandas, one document per group.

The registered demo renders deterministic markdown FROM the documents
table (headings/fences/lists injected at fixed word offsets — same
closed-form-payload pattern as `m_image_decode`) and parses it back;
the oracle re-renders and RE-PARSES independently in SQL, so a parser
bug on either side breaks the hash match.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import Ctx, query

_WORDS_PER_LINE = 8

# chunk i structure: i%5==0 heading (level 1 at 0, alternating 2/3 after,
# blank line before), i%5==2 complete fenced code block (language cycles
# python/json/mermaid), i%5==4 list line, else plain text
_RENDER_SPARK = """
array_join(
  transform(sequence(0, CAST(ceil(size(split({t}, ' ')) / {w}.0) AS INT) - 1), i ->
    CASE
      WHEN i % 5 = 0 AND i = 0
        THEN concat('# ', array_join(slice(split({t}, ' '), i*{w}+1, {w}), ' '))
      WHEN i % 5 = 0
        THEN concat('\\n', CASE WHEN (i div 5) % 2 = 1 THEN '## ' ELSE '### ' END,
                    array_join(slice(split({t}, ' '), i*{w}+1, {w}), ' '))
      WHEN i % 5 = 2
        THEN concat('```', element_at(array('python','json','mermaid'), CAST((i div 5) % 3 + 1 AS INT)),
                    '\\n', array_join(slice(split({t}, ' '), i*{w}+1, {w}), ' '), '\\n```')
      WHEN i % 5 = 4
        THEN concat('- ', array_join(slice(split({t}, ' '), i*{w}+1, {w}), ' '))
      ELSE array_join(slice(split({t}, ' '), i*{w}+1, {w}), ' ')
    END),
  '\\n')
"""

_RENDER_DUCK = """
array_to_string(
  list_transform(range(0, CAST(ceil(len(string_split({t}, ' ')) / {w}.0) AS INT)), i ->
    CASE
      WHEN i % 5 = 0 AND i = 0
        THEN '# ' || array_to_string(list_slice(string_split({t}, ' '), i*{w}+1, i*{w}+{w}), ' ')
      WHEN i % 5 = 0
        THEN chr(10) || (CASE WHEN (i // 5) % 2 = 1 THEN '## ' ELSE '### ' END) ||
             array_to_string(list_slice(string_split({t}, ' '), i*{w}+1, i*{w}+{w}), ' ')
      WHEN i % 5 = 2
        THEN '```' || (['python','json','mermaid'])[(i // 5) % 3 + 1] || chr(10) ||
             array_to_string(list_slice(string_split({t}, ' '), i*{w}+1, i*{w}+{w}), ' ') || chr(10) || '```'
      WHEN i % 5 = 4
        THEN '- ' || array_to_string(list_slice(string_split({t}, ' '), i*{w}+1, i*{w}+{w}), ' ')
      ELSE array_to_string(list_slice(string_split({t}, ' '), i*{w}+1, i*{w}+{w}), ' ')
    END),
  chr(10))
"""


def render_markdown_expr(text_col: str = "text"):
    """Deterministic markdown rendering of a flat-text column (demo
    payload generator; real corpora arrive as markdown already)."""
    return F.expr(_RENDER_SPARK.format(t=text_col, w=_WORDS_PER_LINE))


_CODE_LANGS = {"mermaid": "mermaid", "json": "json", "yaml": "yaml", "yml": "yaml"}


def parse_markdown_blocks(
    df: DataFrame, id_col: str = "doc_id", md_col: str = "md"
) -> DataFrame:
    """Markdown → block AST rows:
    (id, block_no, block_type, lang, level, n_lines, words, section_path,
     text). Fence state = parity of preceding fence markers; blocks =
    kind-transition groups (each heading its own block); breadcrumbs =
    windowed last-heading per level with descendant-validity checks."""
    w = Window.partitionBy(id_col).orderBy("ln")
    w_all = w.rowsBetween(Window.unboundedPreceding, 0)
    w_before = w.rowsBetween(Window.unboundedPreceding, -1)

    lines = df.select(
        id_col, F.posexplode(F.split(F.col(md_col), "\n")).alias("ln", "line")
    )
    lines = (
        lines.withColumn("is_fence", F.col("line").rlike("^```"))
        .withColumn(
            "cumf",
            F.coalesce(F.sum(F.col("is_fence").cast("int")).over(w_before), F.lit(0)),
        )
        .withColumn("in_code", (F.col("cumf") % 2 == 1) & ~F.col("is_fence"))
    )
    level = F.when(
        ~F.col("in_code") & ~F.col("is_fence"),
        F.length(F.regexp_extract("line", r"^(#{1,6}) ", 1)),
    ).otherwise(0)
    kind = (
        F.when(F.col("is_fence"), "fence")
        .when(F.col("in_code"), "code")
        .when(F.col("line") == "", "blank")
        .when(level > 0, "heading")
        .when(F.col("line").rlike("^- "), "list")
        .otherwise("text")
    )
    lines = lines.withColumn("kind", kind).withColumn("level", level)
    fence_lang = F.when(
        F.col("is_fence"), F.regexp_extract("line", r"^```(\w*)", 1)
    )
    lines = lines.withColumn(
        "cur_lang", F.last(fence_lang, ignorenulls=True).over(w_all)
    )

    def last_heading(lvl: int):
        return F.max(
            F.when(
                (F.col("kind") == "heading") & (F.col("level") == lvl),
                F.struct(
                    F.col("ln").alias("hln"),
                    F.regexp_replace("line", r"^#{1,6} ", "").alias("txt"),
                ),
            )
        ).over(w_all)

    lines = (
        lines.withColumn("h1", last_heading(1))
        .withColumn("h2", last_heading(2))
        .withColumn("h3", last_heading(3))
    )
    prev_kind = F.lag("kind").over(w)
    lines = lines.withColumn(
        "block_id",
        F.sum(
            (
                (F.col("kind") != F.coalesce(prev_kind, F.lit("§")))
                | (F.col("kind") == "heading")
            ).cast("int")
        ).over(w_all),
    )

    content = lines.filter(~F.col("kind").isin("fence", "blank"))
    first = F.min(
        F.struct("ln", "kind", "level", "cur_lang", "h1", "h2", "h3")
    ).alias("f")
    blocks = content.groupBy(id_col, "block_id").agg(
        first,
        F.count("*").alias("n_lines"),
        F.sum(F.size(F.split("line", " "))).alias("words"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(ln, line))), s -> s.line)"),
            "\n",
        ).alias("text"),
    )
    h1, h2, h3 = F.col("f.h1"), F.col("f.h2"), F.col("f.h3")
    p1 = h1["txt"]
    h2_ok = h2.isNotNull() & (h1.isNull() | (h2["hln"] > h1["hln"]))
    p2 = F.when(h2_ok, h2["txt"])
    base_ln = F.greatest(
        F.coalesce(h1["hln"], F.lit(-1)),
        F.coalesce(F.when(h2_ok, h2["hln"]), F.lit(-1)),
    )
    p3 = F.when(h3.isNotNull() & (h3["hln"] > base_ln), h3["txt"])
    btype = F.when(
        F.col("f.kind") == "code",
        F.coalesce(
            *[
                F.when(F.col("f.cur_lang") == k, v)
                for k, v in _CODE_LANGS.items()
            ],
            F.lit("code"),
        ),
    ).otherwise(F.col("f.kind"))
    return blocks.select(
        id_col,
        F.row_number().over(Window.partitionBy(id_col).orderBy(F.col("f.ln"))).alias("block_no"),
        btype.alias("block_type"),
        F.when(F.col("f.kind") == "code", F.col("f.cur_lang")).alias("lang"),
        F.col("f.level").alias("level"),
        "n_lines",
        "words",
        F.concat_ws(" > ", p1, p2, p3).alias("section_path"),
        "text",
    )


def semantic_chunks(
    blocks: DataFrame,
    id_col: str = "doc_id",
    target_words: int = 1000,
    min_words: int = 800,
    max_words: int = 1500,
) -> DataFrame:
    """Reference chunk grouping (`group_ast_to_semantic_chunks`): one
    document per applyInPandas group, sequential accumulation. Code-
    family blocks are excluded from chunk text (the code-stripping
    analog); nodes under 5 words are skipped; giant nodes hard-cut."""
    code_types = ("code", "mermaid", "json", "yaml")

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("block_no")
        out = []
        cur_texts: list[str] = []
        cur_words = 0
        num = 1

        def finalize(boundary: str):
            nonlocal cur_texts, cur_words, num
            if not cur_texts:
                return
            text = "\n\n".join(cur_texts)
            out.append((num, len(text.split()), boundary, text))
            cur_texts, cur_words = [], 0
            num += 1

        for row in pdf.itertuples():
            if row.block_type in code_types:
                continue  # stripped from prose
            n = len(row.text.split())
            if n < 5:
                continue
            if n > max_words:
                finalize("semantic")
                words = row.text.split()
                for s in range(0, len(words), target_words):
                    piece = " ".join(words[s : s + target_words])
                    out.append((num, len(piece.split()), "hard_cut", piece))
                    num += 1
                continue
            if row.block_type == "heading" and cur_words >= target_words and cur_texts:
                finalize("semantic")
            if cur_words + n > max_words and cur_texts:
                finalize("semantic")
            cur_texts.append(row.text)
            cur_words += n
        finalize("end_of_document")
        doc = pdf[id_col].iloc[0] if len(pdf) else None
        return pd.DataFrame(
            {
                id_col: [doc] * len(out),
                "chunk_number": [o[0] for o in out],
                "word_count": [o[1] for o in out],
                "boundary_type": [o[2] for o in out],
                "chunk_text": [o[3] for o in out],
            }
        )

    return blocks.groupBy(id_col).applyInPandas(
        fit,
        schema=f"{id_col} long, chunk_number int, word_count int, "
        "boundary_type string, chunk_text string",
    )


# ---------------------------------------------------------------------------
# registered query + DuckDB oracle twin of the parser
# ---------------------------------------------------------------------------

_MD_ORACLE = f"""
WITH md AS (
  SELECT doc_id, {_RENDER_DUCK.format(t='text', w=_WORDS_PER_LINE)} AS md FROM documents
),
rawlines AS (
  SELECT doc_id,
         unnest(range(1, len(string_split(md, chr(10)))+1)) - 1 AS ln,
         unnest(string_split(md, chr(10))) AS line
  FROM md
),
l1 AS (
  SELECT doc_id, ln, line,
         regexp_matches(line, '^```') AS is_fence
  FROM rawlines
),
l2 AS (
  SELECT *,
         coalesce(sum(CASE WHEN is_fence THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY ln
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumf
  FROM l1
),
l3 AS (
  SELECT *,
         (cumf % 2 = 1) AND NOT is_fence AS in_code,
         CASE WHEN NOT ((cumf % 2 = 1) AND NOT is_fence) AND NOT is_fence
              THEN length(coalesce(regexp_extract(line, '^(#{{1,6}}) ', 1), ''))
              ELSE 0 END AS level
  FROM l2
),
l4 AS (
  SELECT *,
         CASE WHEN is_fence THEN 'fence'
              WHEN in_code THEN 'code'
              WHEN line = '' THEN 'blank'
              WHEN level > 0 THEN 'heading'
              WHEN regexp_matches(line, '^- ') THEN 'list'
              ELSE 'text' END AS kind
  FROM l3
),
l5 AS (
  SELECT *,
         last_value(CASE WHEN is_fence THEN regexp_extract(line, '^```(\\w*)', 1) END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY ln ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur_lang,
         max(CASE WHEN kind = 'heading' AND level = 1
                  THEN {{'hln': ln, 'txt': regexp_replace(line, '^#{{1,6}} ', '')}} END)
           OVER (PARTITION BY doc_id ORDER BY ln ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h1,
         max(CASE WHEN kind = 'heading' AND level = 2
                  THEN {{'hln': ln, 'txt': regexp_replace(line, '^#{{1,6}} ', '')}} END)
           OVER (PARTITION BY doc_id ORDER BY ln ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h2,
         max(CASE WHEN kind = 'heading' AND level = 3
                  THEN {{'hln': ln, 'txt': regexp_replace(line, '^#{{1,6}} ', '')}} END)
           OVER (PARTITION BY doc_id ORDER BY ln ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h3,
         CASE WHEN kind <> coalesce(lag(kind) OVER (PARTITION BY doc_id ORDER BY ln), '§')
                   OR kind = 'heading' THEN 1 ELSE 0 END AS bs
  FROM l4
),
l6 AS (
  SELECT *,
         sum(bs) OVER (PARTITION BY doc_id ORDER BY ln
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block_id
  FROM l5
),
content AS (SELECT * FROM l6 WHERE kind NOT IN ('fence', 'blank')),
blocks AS (
  SELECT doc_id, block_id,
         min(ln) AS ln0,
         arg_min(kind, ln) AS kind,
         arg_min(level, ln) AS level,
         arg_min(cur_lang, ln) AS cur_lang,
         arg_min(h1, ln) AS h1,
         arg_min(h2, ln) AS h2,
         arg_min(h3, ln) AS h3,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(len(string_split(line, ' '))) AS BIGINT) AS words
  FROM content GROUP BY doc_id, block_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ln0) AS INT) AS block_no,
       CASE WHEN kind = 'code' THEN
              CASE WHEN cur_lang = 'mermaid' THEN 'mermaid'
                   WHEN cur_lang = 'json' THEN 'json'
                   WHEN cur_lang IN ('yaml', 'yml') THEN 'yaml'
                   ELSE 'code' END
            ELSE kind END AS block_type,
       CASE WHEN kind = 'code' THEN cur_lang END AS lang,
       CAST(level AS INT) AS level,
       n_lines, words,
       concat_ws(' > ',
         h1.txt,
         CASE WHEN h2 IS NOT NULL AND (h1 IS NULL OR h2.hln > h1.hln) THEN h2.txt END,
         CASE WHEN h3 IS NOT NULL AND h3.hln > greatest(
                coalesce(h1.hln, -1),
                coalesce(CASE WHEN h2 IS NOT NULL AND (h1 IS NULL OR h2.hln > h1.hln)
                              THEN h2.hln END, -1)) THEN h3.txt END
       ) AS section_path
FROM blocks
"""


@query("md_blocks", oracle=_MD_ORACLE)
def md_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 markdown AST end-to-end: render deterministic markdown from
    each document, parse it into typed blocks with heading breadcrumbs;
    the oracle re-renders and re-parses independently in DuckDB."""
    ctx = Ctx.get(spark, sf_dir)
    md = ctx.tables["documents"].select(
        "doc_id", render_markdown_expr("text").alias("md")
    )
    return parse_markdown_blocks(md).drop("text")
