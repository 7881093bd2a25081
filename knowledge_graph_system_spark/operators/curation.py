"""Corpus-curation operators: train/eval contamination checking and
greedy sequence packing.

Two more standard steps of a large-scale training-data pipeline (the
reference corpus is one graph and has no analog; these extend the
engine's LLM-pipeline surface alongside `operators/dedup.py` and
`operators/sampling.py`):

- `contamination_check`: flag training documents that share word
  n-grams with an evaluation set — the standard decontamination test.
  Eval sets are small by construction (thousands of prompts), so the
  eval n-gram side is BROADCAST; the training side is one scan with an
  explode whose output is |doc_words| rows per doc — linear, no
  self-join, no shuffle of the training corpus (aggregation after the
  broadcast join is on doc_id, which the join preserves).
- `greedy_pack`: assign documents to fixed-token-budget training
  sequences. A global first-fit is inherently sequential, so this is
  the scale-correct variant: documents are hash-assigned to P
  independent pack groups and packed contiguously within each group in
  deterministic hash order (prefix-sum window → bin = floor(prefix /
  seq_len)). Each group packs in parallel; the window shuffle is on
  the group key, and P is chosen so a group fits a partition. This is
  the packing shape large-corpus trainers actually use (per-shard
  packing), not a toy global loop.

Everything is pure column expressions; both operators ship with exact
DuckDB oracles (tests/test_curation.py runs both engines row-for-row).

Registry note: lib + pytest in r6; @query registration waits for a
free recording-window slot (`registry.py:116-121`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import bucket_sql, hash_bucket


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams (documents shorter than n
    words yield an empty array)."""
    words = F.split(text, " ")
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_check(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per contaminated training doc: how many DISTINCT eval n-grams it
    contains and how many eval docs it collides with.

    Plan shape: eval n-grams (small — eval sets are thousands of rows)
    are dedup'd and broadcast; train n-grams stream through the join
    exploded but never shuffle. Output: (doc_id, n_eval_ngrams,
    n_eval_docs) for docs with >= min_hits distinct shared n-grams."""
    ev = (
        eval_df.select(
            F.col(id_col).alias("eval_id"),
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
        )
        .distinct()
    )
    tr = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    ).distinct()
    hits = tr.join(F.broadcast(ev), "gram")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct("gram").alias("n_eval_ngrams"),
            F.count_distinct("eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_eval_ngrams") >= min_hits)
    )


def contamination_sql(
    train_table: str,
    eval_table: str,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    def grams(tbl: str, alias: str) -> str:
        return f"""
  SELECT DISTINCT {tbl}.{id_col} AS {alias}, g.gram
  FROM {tbl},
       LATERAL (SELECT string_split({tbl}.{text_col}, ' ') AS words) w,
       LATERAL (
         SELECT array_to_string(w.words[u : u + {n - 1}], ' ') AS gram
         FROM unnest(range(1, len(w.words) - {n} + 2)) AS t(u)
       ) g
  WHERE len(w.words) >= {n}"""

    return f"""
WITH __tr_grams AS ({grams(train_table, "doc_id")}),
     __ev_grams AS ({grams(eval_table, "eval_id")})
SELECT t.doc_id,
       CAST(count(DISTINCT t.gram) AS BIGINT) AS n_eval_ngrams,
       CAST(count(DISTINCT e.eval_id) AS BIGINT) AS n_eval_docs
FROM __tr_grams t JOIN __ev_grams e ON t.gram = e.gram
GROUP BY t.doc_id
HAVING count(DISTINCT t.gram) >= {min_hits}
"""


def greedy_pack(
    docs: DataFrame,
    seq_len: int,
    n_groups: int,
    tokens_col: Column | None = None,
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Assign each doc a (pack_group, bin_id, bin_offset): contiguous
    greedy packing in deterministic hash order within hash-assigned
    groups. A doc whose span crosses a bin boundary belongs to the bin
    its first token falls in (`spans_boundary` marks it — real
    tokenizer pipelines split it downstream).

    n_groups sizes the parallelism: each group is one window partition,
    so pick n_groups >= cluster cores and small enough that a group's
    docs fit a partition (at 100 TB: tens of thousands)."""
    from pyspark.sql import Window

    toks = (
        tokens_col
        if tokens_col is not None
        else F.size(F.split(F.col("text"), " "))
    ).cast("bigint")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
        (hash_bucket(F.col(id_col), salt) % n_groups).alias("pack_group"),
        hash_bucket(F.col(id_col), salt + "#order").alias("__ord"),
    )
    w = Window.partitionBy("pack_group").orderBy("__ord", "doc_id")
    cum = F.sum("n_tokens").over(w)
    return (
        d.withColumn("__start", cum - F.col("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            "pack_group",
            F.floor(F.col("__start") / seq_len).cast("bigint").alias("bin_id"),
            (F.col("__start") % seq_len).alias("bin_offset"),
            (
                (F.col("__start") % seq_len) + F.col("n_tokens") > seq_len
            ).alias("spans_boundary"),
        )
    )


def greedy_pack_sql(
    table: str,
    seq_len: int,
    n_groups: int,
    tokens_sql: str = "len(string_split(text, ' '))",
    id_col: str = "doc_id",
    salt: str = "pack",
) -> str:
    grp = f"({bucket_sql(id_col, salt)}) % {n_groups}"
    ordb = bucket_sql(id_col, salt + "#order")
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id,
         CAST({tokens_sql} AS BIGINT) AS n_tokens,
         {grp} AS pack_group,
         {ordb} AS __ord
  FROM {table}
),
c AS (
  SELECT doc_id, n_tokens, pack_group,
         sum(n_tokens) OVER (
           PARTITION BY pack_group ORDER BY __ord, doc_id
         ) - n_tokens AS __start
  FROM d
)
SELECT doc_id, n_tokens, pack_group,
       CAST(floor(__start / {seq_len}) AS BIGINT) AS bin_id,
       __start % {seq_len} AS bin_offset,
       (__start % {seq_len}) + n_tokens > {seq_len} AS spans_boundary
FROM c
"""
