"""Join operators (SURVEY.md §2.3, J1–J9).

Reference parity: the reference hand-builds *batching patterns* (N+1
prevention, IN-list chunks of 25) because every join crosses into
Postgres row-at-a-time (`/root/reference/api/app/lib/graph_facade.py:
890-967`, `api/app/routes/queries.py:199-220,673-701`). In Spark each
J# is one declarative join; Catalyst picks broadcast vs shuffle per
side-size, and AQE re-plans at runtime. The hand-batching disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import dot_expr, with_unit_vec
from ..functions import oracle_snippets as osql
from ..functions.scale import local_df
from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes

# Node rows above this lose hydrate_ids' broadcast hint (wide rows:
# id + label + name + ontology strings — the LM-count width class).
NODE_HYDRATE_BROADCAST_MAX = 1_000_000


def evidence_join(tables: dict[str, DataFrame]) -> DataFrame:
    """J1: the Concept→Instance→Source evidence chain, modeled as
    customer→orders→lineitem→part (3-way). Catalyst broadcast-joins the
    dim sides; lineitem (the 100 TB side) is scanned once with pushed
    filters."""
    c, o, l, p = (tables["customer"], tables["orders"], tables["lineitem"], tables["part"])
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
    )


def concepts_for_sources(tables: dict[str, DataFrame]) -> DataFrame:
    """J2: one query for N sources → {source: [concepts]} — the
    reference's N+1 prevention (`graph_facade.py:890-924`). Here:
    join + groupBy + sorted collect_set."""
    o, l, p = tables["orders"], tables["lineitem"], tables["part"]
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("o_orderkey")
        .agg(F.concat_ws(",", F.sort_array(F.collect_set("p_name"))).alias("part_names"))
    )


def hydrate_ids(nodes: DataFrame, ids: DataFrame) -> DataFrame:
    """J4: batch label/name hydration for an ID set; unresolved ids keep
    NULLs (reference IN-list fetch, `graph_facade.py:930-967`).

    The build side of a broadcast LEFT join must be the right (nodes)
    side, and the node table is O(V) — so the hint is counted, not
    forced (r11 sweep): under the bound the tiny IN-list avoids a
    node-table shuffle entirely; at 100 TB the join correctly shuffles
    on node_id (where the graph's hash-bucketed layout makes it a
    co-located join anyway)."""
    from ..functions.scale import maybe_broadcast

    return ids.join(
        maybe_broadcast(nodes, NODE_HYDRATE_BROADCAST_MAX), "node_id", "left"
    ).select(ids["node_id"], "label", "name", "ontology")


@query(
    "j1_evidence_join",
    oracle="""
SELECT c.c_name, o.o_orderkey, p.p_name, l.l_linenumber,
       round(l.l_quantity, 2) AS quantity,
       round(l.l_extendedprice * (1 - l.l_discount), 4) AS net_price
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'F'
""",
)
def j1_evidence_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    joined = evidence_join(ctx.tables)
    return joined.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("o_orderstatus") == "F")
    ).select(
        "c_name",
        "o_orderkey",
        "p_name",
        "l_linenumber",
        F.round("l_quantity", 2).alias("quantity"),
        # 4 dp, NOT 2: the product of two 2-dp values is an exact 4-decimal
        # rational, so rounding at 2 dp hits exact .005 midpoints where
        # Spark (BigDecimal HALF_UP) and DuckDB (raw double) disagree.
        # Rounding at (or above) the exact precision never straddles.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
    )


@query(
    "j2_concepts_for_sources",
    oracle="""
SELECT o.o_orderkey,
       list_aggregate(list_sort(list(DISTINCT p.p_name)), 'string_agg', ',') AS part_names
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY o.o_orderkey
""",
)
def j2_concepts_for_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    return concepts_for_sources(ctx.tables)


@query(
    "j3_left_outer_enrich",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spend
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
)
def j3_left_outer_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: OPTIONAL MATCH analog — customers keep a row even with zero
    orders (`routes/queries.py:675-678`)."""
    ctx = Ctx.get(spark, sf_dir)
    c, o = ctx.tables["customer"], ctx.tables["orders"]
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


_HYDRATE_IDS = ["C1", "C5", "P10", "S3", "O42", "ZZ-missing"]


@query(
    "j4_hydrate_ids",
    oracle=graph_ctes()
    + f"""
SELECT ids.node_id, n.label, n.name, n.ontology
FROM (VALUES {', '.join("('" + i + "')" for i in _HYDRATE_IDS)}) AS ids(node_id)
LEFT JOIN nodes n ON n.node_id = ids.node_id
""",
)
def j4_hydrate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    ctx = Ctx.get(spark, sf_dir)
    ids = local_df(spark, [(i,) for i in _HYDRATE_IDS], "node_id string")
    return hydrate_ids(ctx.nodes, ids)


@query(
    "j5_cross_ontology_affinity",
    oracle="""
WITH membership AS (
  SELECT DISTINCT c.c_mktsegment AS seg, l.l_partkey AS pk
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
totals AS (SELECT seg, CAST(count(*) AS BIGINT) AS total FROM membership GROUP BY seg),
shared AS (
  SELECT a.seg AS seg_a, b.seg AS seg_b, CAST(count(*) AS BIGINT) AS shared
  FROM membership a JOIN membership b ON a.pk = b.pk AND a.seg < b.seg
  GROUP BY a.seg, b.seg
)
SELECT s.seg_a, s.seg_b, s.shared,
       round(s.shared / CAST(least(ta.total, tb.total) AS DOUBLE), 6) AS affinity
FROM shared s
JOIN totals ta ON ta.seg = s.seg_a
JOIN totals tb ON tb.seg = s.seg_b
""",
)
def j5_cross_ontology_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: concepts shared between ontologies → shared/total affinity
    (`ontology_scoring.py:213-266`), as segment-pairs sharing parts.

    r17 optimization (guide §2.3/§2.4 — aggregate before you shuffle,
    remove shuffles outright): the r16 shape materialized the DISTINCT
    (seg, pk) membership and SELF-JOINED it on pk — one distinct
    exchange plus TWO membership-sized sort-merge exchanges plus the
    pair groupBy. The ontology set per concept is bounded by the
    number of ontologies (5 segments here), so the self-join is
    replaced by ONE groupBy(pk).collect_set(seg) exchange (partial
    aggregation map-side, set ≤ |ontologies| per key) and the C(n,2)
    seg pairs are expanded row-locally with an array expression — the
    lsh_candidates trick. totals/shared then aggregate frames bounded
    by |concepts| and |ontologies|². At 100 TB this removes two
    corpus-scale shuffles and the self-join's hot-concept quadratic
    join rows (a pk in k ontologies emitted k²/2 join rows; now a
    k-element set expands in place). Same oracle — results identical
    (proven hash-exact at both gate SFs)."""
    ctx = Ctx.get(spark, sf_dir)
    c, o, l = ctx.tables["customer"], ctx.tables["orders"], ctx.tables["lineitem"]
    grouped = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sort_array(F.collect_set("c_mktsegment")).alias("segs"))
        .select("segs")
        # reused by totals + pair expansion: materialize once (a frame
        # bounded by |concepts| rows × ≤|ontologies| entries each)
        .localCheckpoint(eager=True)
    )
    totals = (
        grouped.select(F.explode("segs").alias("seg"))
        .groupBy("seg")
        .agg(F.count("*").alias("total"))
    )
    shared = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(segs, (x, i) -> transform("
                    "slice(segs, i + 2, size(segs) - i - 1), y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("seg_a"), F.col("p.b").alias("seg_b"))
        .agg(F.count("*").alias("shared"))
    )
    ta = totals.alias("ta")
    tb = totals.alias("tb")
    return (
        shared.join(F.broadcast(ta), F.col("seg_a") == F.col("ta.seg"))
        .join(F.broadcast(tb), F.col("seg_b") == F.col("tb.seg"))
        .select(
            "seg_a",
            "seg_b",
            "shared",
            F.round(
                F.col("shared") / F.least(F.col("ta.total"), F.col("tb.total")).cast("double"),
                6,
            ).alias("affinity"),
        )
    )


@query(
    "j8_stale_anti_join",
    oracle="""
WITH building_parts AS (
  SELECT DISTINCT l.l_partkey
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 5000.0
)
SELECT p.p_brand, CAST(count(*) AS BIGINT) AS missing
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM building_parts b WHERE b.l_partkey = p.p_partkey)
GROUP BY p.p_brand
""",
)
def j8_stale_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: stale/missing-derivation detection as a left-anti join
    (`schema/00_baseline.sql:3414-3540`): parts with no evidence in the
    BUILDING scope (non-empty at every sf, unlike never-ordered parts)."""
    ctx = Ctx.get(spark, sf_dir)
    c, o, l, p = (
        ctx.tables["customer"],
        ctx.tables["orders"],
        ctx.tables["lineitem"],
        ctx.tables["part"],
    )
    building_parts = (
        c.filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 5000.0))
        .join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .select("l_partkey")
        .distinct()
    )
    return (
        p.join(building_parts, p.p_partkey == building_parts.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("missing"))
    )


_INCOMING_N = 24


@query(
    "j9_two_tier_matcher",
    oracle=graph_ctes()
    + f""",
incoming AS (
  SELECT i AS incoming_id, 'inc:' || i AS seed,
         CASE WHEN i % 5 = 0 THEN 'HOUSEHOLD' WHEN i % 5 = 1 THEN 'BUILDING'
              WHEN i % 5 = 2 THEN 'AUTOMOBILE' WHEN i % 5 = 3 THEN 'FURNITURE'
              ELSE 'MACHINERY' END AS ontology
  FROM generate_series(0, {_INCOMING_N - 1}) AS g(i)
),
inc_emb AS (
  SELECT incoming_id, ontology, list_transform(raw, x -> x / norm) AS emb FROM
  (SELECT incoming_id, ontology, raw, {osql.l2_norm_sql('raw')} AS norm FROM
   (SELECT incoming_id, ontology, {osql.raw_vec_sql('seed')} AS raw FROM incoming) t1) t2
),
cand AS (SELECT node_id, ontology, emb FROM {osql.unit_vec_cte('node_id', 'node_id, ontology', "(SELECT * FROM nodes WHERE label = 'Customer')")} c),
scored AS (
  SELECT i.incoming_id, c.node_id, round({osql.dot_sql('i.emb', 'c.emb')}, 6) AS sim,
         (i.ontology = c.ontology) AS label_match
  FROM inc_emb i CROSS JOIN cand c
),
tiered AS (
  SELECT *, CASE WHEN sim >= 0.5 THEN 'strict'
                 WHEN sim >= 0.3 AND label_match THEN 'label_boost' END AS tier
  FROM scored
  WHERE sim >= 0.5 OR (sim >= 0.3 AND label_match)
)
SELECT incoming_id, node_id, sim, tier
FROM (SELECT *, row_number() OVER (PARTITION BY incoming_id ORDER BY sim DESC, node_id) AS rn FROM tiered)
WHERE rn = 1
""",
)
def j9_two_tier_matcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9/V4: the concept dedup-merge matcher — accept a candidate at
    strict similarity ≥0.5, or ≥0.3 with matching label/ontology; best
    match per incoming (`/root/reference/api/app/lib/concept_matcher.py:
    135-228`, thresholds rescaled to the 16-dim space). Incoming batch is
    tiny → broadcast; candidates scanned once. At 100 TB the cross score
    would be LSH-blocked (see operators/dedup.py) — same contract."""
    ctx = Ctx.get(spark, sf_dir)
    segs = ["HOUSEHOLD", "BUILDING", "AUTOMOBILE", "FURNITURE", "MACHINERY"]
    inc = local_df(
        spark,
        [(i, f"inc:{i}", segs[i % 5]) for i in range(_INCOMING_N)],
        "incoming_id long, seed string, ontology string",
    )
    inc = with_unit_vec(inc, "seed", out_col="emb").drop("seed")
    cand = ctx.nodes_emb.filter(F.col("label") == "Customer").select(
        "node_id", F.col("ontology").alias("c_ontology"), F.col("embedding").alias("c_emb")
    )
    scored = (
        cand.join(F.broadcast(inc))
        .withColumn("sim", F.round(dot_expr("emb", "c_emb"), 6))
        .withColumn("label_match", F.col("ontology") == F.col("c_ontology"))
    )
    tiered = scored.filter(
        (F.col("sim") >= 0.5) | ((F.col("sim") >= 0.3) & F.col("label_match"))
    ).withColumn(
        "tier",
        F.when(F.col("sim") >= 0.5, "strict").otherwise(
            F.when((F.col("sim") >= 0.3) & F.col("label_match"), "label_boost")
        ),
    )
    w = Window.partitionBy("incoming_id").orderBy(F.col("sim").desc(), F.col("node_id"))
    return (
        tiered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("incoming_id", "node_id", "sim", "tier")
    )


# ---------------------------------------------------------------------------
# X2: skew-salted join demo (100 TB posture)
# ---------------------------------------------------------------------------

# Fixture amplification (VERDICT r5 task #2): at sf0.1 the raw hot
# partition is ~590k tiny rows — a sub-second serial sort, so r4's
# driver bench showed salted ≈ naive (0.732 vs 0.728 s): the demo pair
# was noise-level. The fact side is therefore replicated ×_X2_REP and
# the join-stage aggregate carries a real per-row cost (an md5-derived
# checksum, identical closed form in both engines), so the un-mitigated
# serial tail is seconds long and the salted spread is measurable.
# AQE's skew split stays ON for both legs and still does not rescue the
# naive plan: the hot partition (~tens of MB) sits far below
# skewedPartitionThresholdInBytes (256 MB) — exactly the hub-key regime
# where salting is the explicit fix.
_X2_REP = 6

_X2_ORACLE = f"""
SELECT d.brand, CAST(count(*) AS BIGINT) AS n,
       round(sum(l.l_extendedprice), 2) AS revenue,
       CAST(sum(('0x' || substr(md5(CAST(l.l_orderkey AS VARCHAR)), 1, 6))::BIGINT) AS BIGINT) AS checksum
FROM (SELECT CASE WHEN l_partkey % 50 = 0 THEN 'P' || l_partkey
             ELSE 'HOT' END AS skew_key, l_extendedprice, l_orderkey
      FROM lineitem, generate_series(1, {_X2_REP})) l
JOIN (SELECT 'P' || p_partkey AS skew_key, p_brand AS brand FROM part
      UNION ALL SELECT 'HOT', 'Brand#HOT') d ON d.skew_key = l.skew_key
GROUP BY d.brand
"""


def _x2_sides(ctx: Ctx) -> tuple[DataFrame, DataFrame]:
    """A deliberately pathological join: ~98% of fact rows share ONE
    key ('HOT'); the rest spread over per-part keys. The dim side is
    part-sized. This is the hub-concept shape that breaks a plain
    shuffle join at 100 TB: one reducer gets the hot partition. The
    ×{_X2_REP} replication stands in for the row volume a real hub key
    carries (see note above) without inflating the test dataset."""
    l = (
        ctx.tables["lineitem"]
        .select(
            F.when(
                F.col("l_partkey") % 50 == 0,
                F.concat(F.lit("P"), F.col("l_partkey").cast("string")),
            )
            .otherwise("HOT")
            .alias("skew_key"),
            "l_extendedprice",
            "l_orderkey",
        )
        .withColumn("_rep", F.explode(F.expr(f"sequence(1, {_X2_REP})")))
        .drop("_rep")
    )
    d = (
        ctx.tables["part"]
        .select(
            F.concat(F.lit("P"), F.col("p_partkey").cast("string")).alias("skew_key"),
            F.col("p_brand").alias("brand"),
        )
        .unionByName(
            local_df(ctx.spark, [("HOT", "Brand#HOT")], "skew_key string, brand string")
        )
    )
    return l, d


def _x2_agg(joined: DataFrame) -> DataFrame:
    # the checksum makes the reduce-side cost per joined row real: the
    # naive plan pays it serially on the hot task, the salted plan
    # spreads it — and it is bit-identical to the oracle's closed form
    return joined.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 6), 16, 10)
            .cast("long")
        ).cast("long").alias("checksum"),
    )


@query("x2_skew_naive_join", oracle=_X2_ORACLE)
def x2_skew_naive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The naive plan, shuffle-join forced (merge hint): the 'HOT' key
    lands on one reducer — the serial tail salting exists to remove.
    Kept registered so BENCH records naive-vs-salted side by side.

    (AQE's skew split — on in the factory session — only triggers past
    `skewedPartitionThresholdInBytes` (256 MB); a hub key below that
    still serializes one task, and salting is the explicit fix.)"""
    ctx = Ctx.get(spark, sf_dir)
    l, d = _x2_sides(ctx)
    return _x2_agg(l.hint("merge").join(d, "skew_key"))


@query("x2_skew_salted_join", oracle=_X2_ORACLE)
def x2_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join through `functions.skew.salted_join` (n_salts=32,
    matching executor parallelism): the left side is salted by row
    hash, the dim side replicated 32x, so the hot key spreads across
    32 tasks. Same oracle as the naive plan — salting must be
    semantically invisible."""
    from ..functions.skew import salted_join

    ctx = Ctx.get(spark, sf_dir)
    l, d = _x2_sides(ctx)
    return _x2_agg(salted_join(l, d.hint("merge"), "skew_key", n_salts=32))
