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

from ..functions.teacher import (
    LEN_SAT_WORDS,
    QUALITY_DP,
    W_DISTINCT,
    W_LEN,
    quality_expr_spark,
    quality_sql_duck,
)
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
    # the quality column restates the consolidated teacher
    # (functions/teacher.py) in FEATURE-COLUMN space (n_distinct /
    # n_words already materialized) — constants shared, structure
    # local, like classifier._Y_SQL
    oracle=f"""
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
       round({W_DISTINCT} * (n_distinct / CAST(n_words AS DOUBLE))
             + {W_LEN} * least(n_words / {LEN_SAT_WORDS}.0, 1.0), {QUALITY_DP}) AS quality
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
        F.round(
            W_DISTINCT * dr
            + W_LEN * F.least(F.col("n_words") / float(LEN_SAT_WORDS), F.lit(1.0)),
            QUALITY_DP,
        ).alias("quality"),
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


# ---------------------------------------------------------------------------
# T5: the corpus-filter composite — the training-data pipeline capstone
# ---------------------------------------------------------------------------

MIN_WORDS = 30
MIN_QUALITY = 0.6


@query(
    "t_corpus_filter",
    # the quality column renders through the consolidated teacher
    # (functions/teacher.py) — words form over string_split(d.text, ' ')
    oracle=f"""
WITH RECURSIVE
ex AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, ws[i] || '_' || ws[i+1] AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
       generate_series(1, 600) AS g(i)
  WHERE i + 1 <= len(ws)
),
sigs AS (SELECT doc_id, min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
                min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
                min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
                min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
         FROM shingles GROUP BY doc_id),
bands AS (SELECT doc_id, band FROM sigs,
          unnest(['b0|' || h0 || h1, 'b1|' || h2 || h3,
                  'b2|' || h4 || h5, 'b3|' || h6 || h7]) AS u(band)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter FROM cand c
          JOIN shingles sa ON sa.doc_id = c.doc_a
          JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          GROUP BY c.doc_a, c.doc_b),
pairs AS (SELECT i.doc_a, i.doc_b FROM inter i
          JOIN sizes na ON na.doc_id = i.doc_a
          JOIN sizes nb ON nb.doc_id = i.doc_b
          WHERE i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE) >= 0.5),
und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(node, comp) AS (
  SELECT DISTINCT a, a FROM und
  UNION
  SELECT u.b, r.comp FROM reach r JOIN und u ON u.a = r.node),
nd AS (SELECT node AS doc_id, min(comp) AS group_id FROM reach GROUP BY node),
feat AS (
  SELECT d.doc_id, d.lang,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
         {quality_sql_duck("string_split(d.text, ' ')")} AS quality,
         len(list_intersect(string_split(d.text, ' '), ['the','and','of','to','in'])) AS s_en,
         len(list_intersect(string_split(d.text, ' '), ['el','la','de','que','y'])) AS s_es,
         len(list_intersect(string_split(d.text, ' '), ['le','la','de','et','les'])) AS s_fr,
         len(list_intersect(string_split(d.text, ' '), ['der','die','und','das','ist'])) AS s_de,
         len(list_intersect(string_split(d.text, ' '), ['de','shi','le','bu','wo'])) AS s_zh
  FROM documents d
)
SELECT CAST(f.doc_id AS BIGINT) AS doc_id,
       CASE
         WHEN ex.keeper <> f.doc_id THEN 'exact_dup'
         WHEN nd.group_id IS NOT NULL AND nd.group_id <> f.doc_id THEN 'near_dup'
         WHEN f.n_words < 30 THEN 'too_short'
         WHEN f.quality < 0.6 THEN 'low_quality'
         WHEN (CASE greatest(s_en, s_es, s_fr, s_de, s_zh)
                 WHEN s_en THEN 'en' WHEN s_es THEN 'es' WHEN s_fr THEN 'fr'
                 WHEN s_de THEN 'de' ELSE 'zh' END) <> f.lang THEN 'lang_mismatch'
         ELSE 'kept'
       END AS reason,
       CASE
         WHEN ex.keeper <> f.doc_id THEN FALSE
         WHEN nd.group_id IS NOT NULL AND nd.group_id <> f.doc_id THEN FALSE
         WHEN f.n_words < 30 THEN FALSE
         WHEN f.quality < 0.6 THEN FALSE
         WHEN (CASE greatest(s_en, s_es, s_fr, s_de, s_zh)
                 WHEN s_en THEN 'en' WHEN s_es THEN 'es' WHEN s_fr THEN 'fr'
                 WHEN s_de THEN 'de' ELSE 'zh' END) <> f.lang THEN FALSE
         ELSE TRUE
       END AS kept
FROM feat f
JOIN ex ON ex.doc_id = f.doc_id
LEFT JOIN nd ON nd.doc_id = f.doc_id
""",
)
def t_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: the full keep/drop decision per document — exact dedup,
    near-dup groups (minhash-LSH → connected components), length floor,
    quality floor, language-consistency — with a first-failing-reason
    verdict. This is the composite a 100 TB pretraining corpus actually
    runs: every stage is one of the registered operators, chained lazily
    (dedup group resolution is the only iterative piece). The oracle
    recomputes the entire pipeline in SQL."""
    from pyspark.sql.window import Window

    from .components import connected_components
    from .dedup import JACCARD_THRESHOLD, minhash_verified_pairs

    ctx = Ctx.get(spark, sf_dir)
    docs = ctx.tables["documents"]

    exact_keeper = F.min("doc_id").over(Window.partitionBy(F.sha2("text", 256)))

    # r17: array-form pair pipeline — one checkpoint, one corpus
    # exchange (see dedup.minhash_verified_pairs)
    pairs = minhash_verified_pairs(docs).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    nd = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("group_id")
    )

    arr = F.split(F.col("text"), " ")
    langs = ["en", "es", "fr", "de", "zh"]
    feat = docs.select(
        "doc_id",
        "lang",
        exact_keeper.alias("keeper"),
        F.size(arr).cast("long").alias("n_words"),
        # the consolidated teacher (functions/teacher.py), words form
        F.expr(quality_expr_spark("split(text, ' ')")).alias("quality"),
        *[_hits(lang).alias(f"s_{lang}") for lang in langs],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    predicted = (
        F.when(F.col("s_en") == best, "en")
        .when(F.col("s_es") == best, "es")
        .when(F.col("s_fr") == best, "fr")
        .when(F.col("s_de") == best, "de")
        .otherwise("zh")
    )
    reason = (
        F.when(F.col("keeper") != F.col("doc_id"), "exact_dup")
        .when(F.col("group_id").isNotNull() & (F.col("group_id") != F.col("doc_id")), "near_dup")
        .when(F.col("n_words") < MIN_WORDS, "too_short")
        .when(F.col("quality") < MIN_QUALITY, "low_quality")
        .when(predicted != F.col("lang"), "lang_mismatch")
        .otherwise("kept")
    )
    return (
        feat.join(nd, "doc_id", "left")
        .select("doc_id", reason.alias("reason"), (reason == "kept").alias("kept"))
    )
