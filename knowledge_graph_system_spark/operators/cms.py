"""Count-min sketch: mergeable frequency estimation, relational.

The companion to `operators/sketches.py` (HLL answers "how many
distinct"; this answers "how often does item x occur") — the standard
heavy-hitter / frequency primitive for corpora too large to hold exact
per-item counts (Cormode & Muthukrishnan 2005 — public literature).

Relational formulation: d independent hash rows x w buckets; the
sketch STATE is the (row, bucket, c) frame — one groupBy over the
corpus, bounded at d x w rows per group. A point estimate for item x
is min over the d rows of the bucket count x hashes to. Merging shards
is summation per (row, bucket) — groupBy-sum, exactly parallel to
HLL's groupBy-max. Hashing reuses the md5 string-domain trick
(row-salted md5, first 3 hex chars = 4096 buckets), so DuckDB replays
the identical arithmetic and every number here is an exact integer —
no floats anywhere, oracle parity needs no rounding at all.

Guarantees (standard): estimate >= true count always;
estimate <= true + eps * N with probability 1 - delta, for
eps = e / w (~6.6e-4 at w = 4096) and delta = e^-d (~5% at d = 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..registry import query

D = 3      # hash rows
W_HEX = 3  # bucket key = first 3 hex chars -> w = 4096 buckets


def _bucket(value: Column, row: int) -> Column:
    return F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), value.cast("string"))), 1, W_HEX)


def cms_sketch(
    df: DataFrame, value: "Column | str", group: list[str] | None = None
) -> DataFrame:
    """Sketch state: (group..., row, bucket, c). One explode to d rows
    per input row, one groupBy — map-side combine makes the shuffled
    volume d x w per group, not the corpus."""
    v = F.col(value) if isinstance(value, str) else value
    pairs = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _bucket(v, r).alias("bucket"))
            for r in range(D)
        ]
    )
    keys = (group or []) + ["row", "bucket"]
    return (
        df.select(*(group or []), F.explode(pairs).alias("rb"))
        .select(*(group or []), F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy(*keys)
        .agg(F.count("*").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Shard mergeability: counts ADD per (group, row, bucket)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "c"]
    return out.groupBy(*keys).agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str = "item"
) -> DataFrame:
    """(item, est_count): min over the d rows of the item's bucket
    count. `items` is a query batch (broadcast); missing buckets read
    as 0 — an item never seen estimates 0 exactly."""
    probes = items.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(item_col), r).alias("bucket"),
                    )
                    for r in range(D)
                ]
            )
        ).alias("rb"),
    ).select(item_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    joined = sketch.join(F.broadcast(probes), ["row", "bucket"], "right")
    return (
        joined.groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )


def cms_sql_state(table: str, value_sql: str) -> str:
    """DuckDB twin of the ungrouped sketch state (CTE body named
    __cms)."""
    arms = "\nUNION ALL\n".join(
        f"SELECT {r} AS row, substring(md5('cms{r}:' || CAST({value_sql} AS VARCHAR)), 1, {W_HEX}) AS bucket FROM {table}"
        for r in range(D)
    )
    return f"__cms AS (SELECT row, bucket, CAST(count(*) AS BIGINT) AS c FROM ({arms}) GROUP BY row, bucket)"


def cms_estimate_sql(items_sql: str, item_col: str = "item") -> str:
    """DuckDB twin of cms_estimate against __cms (exact integer
    parity)."""
    arms = "\nUNION ALL\n".join(
        f"SELECT {item_col}, {r} AS row, substring(md5('cms{r}:' || CAST({item_col} AS VARCHAR)), 1, {W_HEX}) AS bucket FROM ({items_sql})"
        for r in range(D)
    )
    return f"""
SELECT p.{item_col}, CAST(min(coalesce(s.c, 0)) AS BIGINT) AS est_count
FROM ({arms}) p LEFT JOIN __cms s ON s.row = p.row AND s.bucket = p.bucket
GROUP BY p.{item_col}
"""


# Prepared r8 registry candidate: sketch-estimated counts for the 20
# most frequent corpus words next to their exact counts.
def t_cms_words(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    top = (
        words.groupBy("w")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("w"))
        .limit(20)
    )
    sketch = cms_sketch(words, "w")
    est = cms_estimate(sketch, top.select(F.col("w").alias("item")), "item")
    return top.join(est, top["w"] == est["item"]).select(
        "w", "exact_count", "est_count"
    )


def t_cms_words_oracle() -> str:
    return f"""
WITH words AS (
  SELECT u.w AS w FROM (SELECT string_split(text, ' ') AS ws FROM documents) d,
       unnest(ws) AS u(w)
),
top AS (
  SELECT w, CAST(count(*) AS BIGINT) AS exact_count
  FROM words GROUP BY w ORDER BY exact_count DESC, w LIMIT 20
),
{cms_sql_state("words", "w")},
est AS ({cms_estimate_sql("SELECT w AS item FROM top", "item")})
SELECT top.w, top.exact_count, est.est_count
FROM top JOIN est ON est.item = top.w
"""


# r8 driver row(s): prepared in r7, registered this round (prepared-plan
# discipline — registration only; candidate code and oracles unchanged).
query("t_cms_words", oracle=t_cms_words_oracle())(t_cms_words)
