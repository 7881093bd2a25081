"""Aggregation operators (SURVEY.md §2.4, A1–A15 where relational).

Reference parity: the reference gathers per-concept signals with three
hand-batched queries grouped in Python dicts
(`/root/reference/api/app/services/confidence_analyzer.py:384-490`).
Every aggregation here is a single groupBy with map-side partial
aggregation — the N+1/batching machinery is subsumed by the engine.

Graph-score aggregations (grounding A4, coherence A8, diversity A11,
ontology scoring A7/A9) live in operators/scores.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scale import maybe_broadcast
from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes

# Vocabulary-sized frames (per-word doc frequency) above this row
# count lose the broadcast hint — same bound class as
# lm.LM_COUNT_BROADCAST_MAX (same row width: one word + one count).
IDF_BROADCAST_MAX = 1_000_000


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline scan-heavy aggregation (TPC-H Q1 shape): one pass over
    lineitem, all arithmetic inside whole-stage codegen, partial aggs
    map-side. The canonical 100 TB smoke test for scan throughput."""
    ctx = Ctx.get(spark, sf_dir)
    l = ctx.tables["lineitem"]
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2024-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def confidence_signals(edges: DataFrame) -> DataFrame:
    """A2: per-node signal gather — in-edge count, distinct rel types,
    distinct evidence sources (srcs)."""
    return edges.groupBy(F.col("dst").alias("node_id")).agg(
        F.count("*").alias("rel_count"),
        F.countDistinct("rel_type").alias("type_count"),
        F.countDistinct("src").alias("source_count"),
    )


def confidence_score(signals: DataFrame) -> DataFrame:
    """A3: saturation score composite/(composite+2.0) with level tiers —
    exact formula shape of `/root/reference/api/app/services/
    confidence_analyzer.py:561-627`."""
    composite = (
        F.col("rel_count") / 10.0 + F.col("source_count") / 5.0 + F.col("type_count") / 10.0
    )
    score = F.round(composite / (composite + 2.0), 6)
    return signals.select(
        "node_id",
        "rel_count",
        "type_count",
        "source_count",
        score.alias("confidence_score"),
        F.when(score >= 0.6, "high")
        .when(score >= 0.35, "medium")
        .otherwise("low")
        .alias("confidence_level"),
    )


@query(
    "a2a3_confidence_score",
    oracle=graph_ctes()
    + """,
signals AS (
  SELECT dst AS node_id,
         CAST(count(*) AS BIGINT) AS rel_count,
         CAST(count(DISTINCT rel_type) AS BIGINT) AS type_count,
         CAST(count(DISTINCT src) AS BIGINT) AS source_count
  FROM edges GROUP BY dst
)
SELECT node_id, rel_count, type_count, source_count,
       round((rel_count/10.0 + source_count/5.0 + type_count/10.0) /
             (rel_count/10.0 + source_count/5.0 + type_count/10.0 + 2.0), 6) AS confidence_score,
       CASE WHEN round((rel_count/10.0 + source_count/5.0 + type_count/10.0) /
             (rel_count/10.0 + source_count/5.0 + type_count/10.0 + 2.0), 6) >= 0.6 THEN 'high'
            WHEN round((rel_count/10.0 + source_count/5.0 + type_count/10.0) /
             (rel_count/10.0 + source_count/5.0 + type_count/10.0 + 2.0), 6) >= 0.35 THEN 'medium'
            ELSE 'low' END AS confidence_level
FROM signals
""",
)
def a2a3_confidence_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    return confidence_score(confidence_signals(ctx.edges))


@query(
    "a5_graph_stats",
    oracle=graph_ctes()
    + """
SELECT 'node:' || label AS kind, CAST(count(*) AS BIGINT) AS n FROM nodes GROUP BY label
UNION ALL
SELECT 'edge:' || rel_type, CAST(count(*) AS BIGINT) FROM edges GROUP BY rel_type
""",
)
def a5_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: node counts per label + edge counts per type
    (`query_facade.py:657-706`)."""
    ctx = Ctx.get(spark, sf_dir)
    n = ctx.nodes.groupBy("label").agg(F.count("*").alias("n")).select(
        F.concat(F.lit("node:"), F.col("label")).alias("kind"), "n"
    )
    e = ctx.edges.groupBy("rel_type").agg(F.count("*").alias("n")).select(
        F.concat(F.lit("edge:"), F.col("rel_type")).alias("kind"), "n"
    )
    return n.unionByName(e)


@query(
    "a6_category_distribution",
    oracle=graph_ctes()
    + """
SELECT v.category, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(count(DISTINCT e.rel_type) AS BIGINT) AS n_types
FROM edges e JOIN vocab v ON v.rel_type = e.rel_type
GROUP BY v.category
""",
)
def a6_category_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: edge counts per vocabulary category (`vocabulary.py:671-700`);
    vocab is tiny → broadcast join."""
    ctx = Ctx.get(spark, sf_dir)
    return (
        ctx.edges.join(F.broadcast(ctx.vocab.select("rel_type", "category")), "rel_type")
        .groupBy("category")
        .agg(F.count("*").alias("n_edges"), F.countDistinct("rel_type").alias("n_types"))
    )


@query(
    "a12_evidence_dedup",
    oracle="""
SELECT l_partkey, l_orderkey, l_linenumber, round(l_quantity, 2) AS quantity
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
  FROM lineitem
) WHERE rn = 1
""",
)
def a12_evidence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: drop duplicate evidence keeping the FIRST by a total order
    (`routes/queries.py:56-76`). `dropDuplicates` alone is
    nondeterministic on a distributed engine — the deterministic form is
    row_number over an explicit order, which is what we ship."""
    ctx = Ctx.get(spark, sf_dir)
    w = Window.partitionBy("l_partkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return (
        ctx.tables["lineitem"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey", "l_orderkey", "l_linenumber", F.round("l_quantity", 2).alias("quantity")
        )
    )


@query(
    "a13_best_chunk_per_source",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def a13_best_chunk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: best-match-per-group window pattern (`routes/queries.py:448-457`)."""
    ctx = Ctx.get(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        ctx.tables["orders"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("best_price"))
    )


@query(
    "a14_tfidf_naming",
    oracle="""
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT source, word, CAST(count(*) AS BIGINT) AS tf FROM words GROUP BY source, word),
df AS (SELECT word, CAST(count(DISTINCT source) AS BIGINT) AS df FROM words GROUP BY word),
n AS (SELECT CAST(count(DISTINCT source) AS DOUBLE) AS total FROM documents),
scored AS (
  SELECT tf.source, tf.word, round(tf.tf * ln(n.total / df.df), 6) AS tfidf
  FROM tf JOIN df ON df.word = tf.word CROSS JOIN n
)
SELECT source, word, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY source ORDER BY tfidf DESC, word) AS rn FROM scored)
WHERE rn <= 2
""",
)
def a14_tfidf_naming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: TF-IDF cluster naming — per-cluster term counts × inverse
    doc-frequency, top-2 terms (`embedding_projection_service.py:836-908`),
    with documents.source as the cluster key. explode → two partial-agg
    groupBys → broadcast idf join → per-group top-k window."""
    ctx = Ctx.get(spark, sf_dir)
    docs = ctx.tables["documents"]
    words = docs.select("source", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("source", "word").agg(F.count("*").alias("tf"))
    # The doc-frequency frame is vocabulary-sized — Heaps-law growth
    # with the corpus, the same class as lm.py's count frames — so the
    # broadcast is counted, not forced (checkpoint shares the
    # aggregation between the count and the join).
    df = (
        words.groupBy("word")
        .agg(F.countDistinct("source").alias("df"))
        .localCheckpoint(eager=True)
    )
    total = docs.select(F.countDistinct("source").cast("double").alias("total"))
    scored = (
        tf.join(maybe_broadcast(df, IDF_BROADCAST_MAX), "word")
        .join(F.broadcast(total))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("total") / F.col("df")), 6))
    )
    w = Window.partitionBy("source").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("source", "word", "tfidf")
    )


@query(
    "a15_lifetime_page",
    oracle="""
WITH ordered AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate::VARCHAR AS shipped_at,
         row_number() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS total
  FROM lineitem WHERE l_partkey = 7
)
SELECT l_partkey, l_orderkey, l_linenumber, shipped_at, CAST(rn AS BIGINT) AS rn, total,
       (total > 20) AS has_more
FROM ordered WHERE rn > 10 AND rn <= 20
""",
)
def a15_lifetime_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: concept-lifetime pagination — ordered evidence stream, page 2
    with has_more (`epoch_facade.py:52-196`, limit+1 pattern expressed as
    a windowed total)."""
    ctx = Ctx.get(spark, sf_dir)
    ev = ctx.tables["lineitem"].filter(F.col("l_partkey") == 7)
    w = Window.orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("total", F.count("*").over(Window.partitionBy()))
        .filter((F.col("rn") > 10) & (F.col("rn") <= 20))
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("string").alias("shipped_at"),
            "rn",
            "total",
            (F.col("total") > 20).alias("has_more"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'MACHINERY'
  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into the fact
    scan, grouped revenue, top-10 without a global sort.

    The cutoff sits inside the fixture's 1995-2001 date span so the
    order/ship straddle is non-empty at every gate sf — an earlier
    2024 literal made this row grade empty==empty (VERDICT r8
    wrong #1)."""
    ctx = Ctx.get(spark, sf_dir)
    c, o, l = ctx.tables["customer"], ctx.tables["orders"], ctx.tables["lineitem"]
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    return (
        c.filter(F.col("c_mktsegment") == "MACHINERY")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(l, o.o_orderkey == l.l_orderkey)
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_supplier_volume",
    oracle="""
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a local-supplier equality — the
    dims chain as broadcasts, lineitem streams once."""
    ctx = Ctx.get(spark, sf_dir)
    t = ctx.tables
    c, n, r, o, l, su = (
        t["customer"],
        t["nation"],
        t["region"],
        t["orders"],
        t["lineitem"],
        t["supplier"],
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            F.broadcast(su),
            (su.s_suppkey == l.l_suppkey) & (su.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )
