"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length /
distinctness / repetition ratios), token counting (whitespace + an
alpha-token regex), and document fingerprinting (md5 shingle extremes —
the portable stand-in for a rolling hash). All pure column expressions
over the documents table; at 100 TB each is one scan with map-side
aggregation, no UDFs.

The chunker/quality shapes mirror the reference's source chunkers and
scoring utilities (`/root/reference/api/app/lib/chunker.py:55-231`,
`api/app/lib/source_chunker.py:82-314`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Ctx, query

# tiny per-language stopword profiles (public common words)
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "les"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}


def _hits(lang: str):
    toks = _LANG_STOPWORDS[lang]
    arr = F.split(F.col("text"), " ")
    return F.size(F.array_intersect(arr, F.array(*[F.lit(t) for t in toks])))


@query(
    "t_langid_confusion",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_intersect(string_split(text, ' '), ['the','and','of','to','in'])) AS s_en,
         len(list_intersect(string_split(text, ' '), ['el','la','de','que','y'])) AS s_es,
         len(list_intersect(string_split(text, ' '), ['le','la','de','et','les'])) AS s_fr,
         len(list_intersect(string_split(text, ' '), ['der','die','und','das','ist'])) AS s_de,
         len(list_intersect(string_split(text, ' '), ['de','shi','le','bu','wo'])) AS s_zh
  FROM documents
),
pred AS (
  SELECT lang,
         CASE greatest(s_en, s_es, s_fr, s_de, s_zh)
           WHEN s_en THEN 'en' WHEN s_es THEN 'es' WHEN s_fr THEN 'fr'
           WHEN s_de THEN 'de' ELSE 'zh' END AS predicted
  FROM scored
)
SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY lang, predicted
""",
)
def t_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: distinct-stopword hits per language profile,
    argmax with a fixed precedence order (en,es,fr,de,zh) — emitted as a
    (true lang × predicted) confusion matrix."""
    ctx = Ctx.get(spark, sf_dir)
    scored = ctx.tables["documents"].select(
        "lang",
        *[_hits(lang).alias(f"s_{lang}") for lang in ["en", "es", "fr", "de", "zh"]],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in ["en", "es", "fr", "de", "zh"]])
    pred = scored.withColumn(
        "predicted",
        F.when(F.col("s_en") == best, "en")
        .when(F.col("s_es") == best, "es")
        .when(F.col("s_fr") == best, "fr")
        .when(F.col("s_de") == best, "de")
        .otherwise("zh"),
    )
    return pred.groupBy("lang", "predicted").agg(F.count("*").alias("n"))


@query(
    "t_quality_score",
    oracle="""
WITH feat AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
         length(replace(text, ' ', '')) AS n_letters
  FROM documents
)
SELECT doc_id, source, n_words, n_distinct,
       round(n_distinct / CAST(n_words AS DOUBLE), 6) AS distinct_ratio,
       round(n_letters / CAST(n_words AS DOUBLE), 6) AS avg_word_len,
       round(0.5 * (n_distinct / CAST(n_words AS DOUBLE))
             + 0.5 * least(n_words / 60.0, 1.0), 6) AS quality
FROM feat
""",
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: distinctness ratio + saturating length prior —
    the length/stopword-ratio shape of pipeline quality filters."""
    ctx = Ctx.get(spark, sf_dir)
    arr = F.split(F.col("text"), " ")
    feat = ctx.tables["documents"].select(
        "doc_id",
        "source",
        F.size(arr).cast("long").alias("n_words"),
        F.size(F.array_distinct(arr)).cast("long").alias("n_distinct"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_letters"),
    )
    dr = F.col("n_distinct") / F.col("n_words").cast("double")
    return feat.select(
        "doc_id",
        "source",
        "n_words",
        "n_distinct",
        F.round(dr, 6).alias("distinct_ratio"),
        F.round(F.col("n_letters") / F.col("n_words").cast("double"), 6).alias("avg_word_len"),
        F.round(0.5 * dr + 0.5 * F.least(F.col("n_words") / 60.0, F.lit(1.0)), 6).alias(
            "quality"
        ),
    )


@query(
    "t_token_counts",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
       CAST(sum(len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '^[a-z]+$')))) AS BIGINT) AS alpha_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
""",
)
def t_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per corpus source: whitespace tokens + BPE-ish
    alpha-token regex + char totals, one scan."""
    ctx = Ctx.get(spark, sf_dir)
    arr = F.split(F.col("text"), " ")
    return (
        ctx.tables["documents"]
        .select(
            "source",
            F.size(arr).alias("ws"),
            F.size(F.filter(arr, lambda w: w.rlike("^[a-z]+$"))).alias("alpha"),
            "n_chars",
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("alpha").alias("alpha_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "t_fingerprint",
    oracle="""
WITH sh AS (
  SELECT DISTINCT doc_id, md5(ws[i] || '_' || ws[i+1]) AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
       generate_series(1, 600) AS g(i)
  WHERE i + 1 <= len(ws)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       substr(min(h), 1, 8) || substr(max(h), 1, 8) AS fingerprint,
       CAST(count(*) AS BIGINT) AS n_shingles
FROM sh GROUP BY doc_id
""",
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: min/max md5 over bigram shingles (the
    winnowing-style extreme-hash selection, engine-portable)."""
    from .dedup import doc_shingles

    ctx = Ctx.get(spark, sf_dir)
    sh = doc_shingles(ctx.tables["documents"]).withColumn("h", F.md5("shingle"))
    return sh.groupBy("doc_id").agg(
        F.concat(
            F.substring(F.min("h"), 1, 8), F.substring(F.max("h"), 1, 8)
        ).alias("fingerprint"),
        F.count("*").alias("n_shingles"),
    )
