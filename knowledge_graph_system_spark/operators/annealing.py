"""Annealing cycle: graph-driven lifecycle proposals (reference ADR-206).

The reference's annealing subsystem re-derives candidates from the graph
every cycle, asks an LLM to pick one verb from a CLOSED six-verb
vocabulary (CLEAVE, DISSOLVE, MERGE, RENAME, NO_ACTION, ESCALATE), and
stores the result as a proposal for the review/approve/execute flow
(`/root/reference/api/app/services/annealing_manager.py:70-150`,
`annealing_decision_service.py:1-50`). The candidate detection and
signal math are pure analytics over the score family this engine
already implements:

- demotion candidates: protection score (A9) below threshold, lifecycle
  not pinned/frozen, concept-count activity floor
  (`annealing_manager.py:328-388`);
- promotion candidates: per-ontology top-degree concepts (A1/G5) above
  a degree floor, excluding concepts already anchoring an ontology
  (`annealing_manager.py:389-455`);
- ecological pressure: avg concepts per ontology vs the ADR-200 comfort
  band, constants 10 / 80 / 150 (`annealing_manager.py:34-46`) —
  the reference interpolates with a Bezier aggressiveness curve; here
  the interpolation is LINEAR (deterministic mock, same endpoints and
  zone cuts `annealing_manager.py:1076-1118`).

The LLM verb decision is mocked deterministically (U1/U4 policy):
  protection < t AND coherence < 0      → DISSOLVE into 'primordial'
  protection < t AND top affinity ≥ 0.5 → MERGE into that partner
  protection < t otherwise              → ESCALATE to review
  top-degree concept ≥ floor            → CLEAVE (new nucleus)
  pressure signal                       → ADJUST_CONTROL (zone label)
No execution, no mutation — proposals only, exactly like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import oracle_snippets as osql
from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes

DEMOTION_THRESHOLD = 0.15   # reference default (`run_annealing_cycle`)
MERGE_AFFINITY = 0.5
MIN_DEGREE = 40
PRIMORDIAL = "primordial"   # reference primordial_pool_name
PRESSURE_COMFORT_MIN = 10.0
PRESSURE_COMFORT_MAX = 80.0
PRESSURE_EMERGENCY = 150.0

_PROPOSAL_SCHEMA = ("kind", "verb", "subject", "target", "score")


def annealing_proposals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One annealing cycle → proposal rows (kind, verb, subject, target,
    score). Composes A9 protection, J5 affinity, and A1 degrees."""
    from .scores import protection_with_affinity
    from .traversal import degrees

    ctx = Ctx.get(spark, sf_dir)

    # -- demotion: A9 scores + best affinity partner per ontology; the
    # affinity frame is the one A9 itself was computed from (shared via
    # protection_with_affinity — no second membership self-join), with
    # the decision-rule comparison on the ROUNDED value so both engines
    # thresold identically
    scores, aff_raw = protection_with_affinity(spark, sf_dir)
    aff = aff_raw.select(
        "seg_a", "seg_b", F.round("affinity", 6).alias("affinity")
    )
    wa = Window.partitionBy("seg_a").orderBy(F.col("affinity").desc(), F.col("seg_b"))
    top_aff = (
        aff.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select(F.col("seg_a").alias("ontology"), "seg_b", "affinity")
    )
    demo = (
        scores.filter(F.col("protection") < DEMOTION_THRESHOLD)
        .join(top_aff, "ontology", "left")
        .select(
            F.lit("demotion").alias("kind"),
            F.when(F.col("coherence") < 0.0, "DISSOLVE")
            .when(F.col("affinity") >= MERGE_AFFINITY, "MERGE")
            .otherwise("ESCALATE")
            .alias("verb"),
            F.col("ontology").alias("subject"),
            F.when(F.col("coherence") < 0.0, PRIMORDIAL)
            .when(F.col("affinity") >= MERGE_AFFINITY, F.col("seg_b"))
            .otherwise("review")
            .alias("target"),
            F.col("protection").alias("score"),
        )
    )

    # -- promotion: per-ontology top-10 degree concepts above the floor,
    # excluding names that already ARE an ontology
    deg = degrees(ctx.edges)
    named = ctx.nodes.select("node_id", "name", "ontology").join(deg, "node_id")
    onto_names = ctx.nodes.select(
        F.lower(F.col("ontology")).alias("lname")
    ).distinct()
    wd = Window.partitionBy("ontology").orderBy(
        F.col("total_degree").desc(), F.col("node_id")
    )
    promo = (
        named.join(
            onto_names, F.lower(F.col("name")) == F.col("lname"), "left_anti"
        )
        .withColumn("rn", F.row_number().over(wd))
        .filter((F.col("rn") <= 10) & (F.col("total_degree") >= MIN_DEGREE))
        .select(
            F.lit("promotion").alias("kind"),
            F.lit("CLEAVE").alias("verb"),
            F.col("node_id").alias("subject"),
            F.col("name").alias("target"),
            F.col("total_degree").cast("double").alias("score"),
        )
    )

    # -- ecological pressure (linear mock of the Bezier curve)
    counts = ctx.nodes.agg(
        F.count("*").alias("n"), F.countDistinct("ontology").alias("k")
    )
    avg = F.col("n") / F.col("k").cast("double")
    below = (F.lit(PRESSURE_COMFORT_MIN) - avg) / PRESSURE_COMFORT_MIN
    above = (avg - F.lit(PRESSURE_COMFORT_MAX)) / (
        PRESSURE_EMERGENCY - PRESSURE_COMFORT_MAX
    )
    p = (
        F.when(avg >= PRESSURE_EMERGENCY, 1.0)
        .when(avg > PRESSURE_COMFORT_MAX, above)
        .when(avg < PRESSURE_COMFORT_MIN, below)
        .otherwise(0.0)
    )
    zone = (
        F.when(p == 0.0, "comfort")
        .when(avg < PRESSURE_COMFORT_MIN, F.when(p < 0.5, "tight").otherwise("over"))
        .when(p < 0.3, "watch")
        .when(p < 0.7, "tight")
        .when(p < 0.9, "over")
        .otherwise("emergency")
    )
    pressure = counts.select(
        F.lit("pressure").alias("kind"),
        F.lit("ADJUST_CONTROL").alias("verb"),
        F.lit("cycle").alias("subject"),
        zone.alias("target"),
        F.round(p, 6).alias("score"),
    )

    return demo.unionByName(promo).unionByName(pressure)


def _oracle() -> str:
    from .scores import _MASS_ORACLE, _coherence_oracle_cte

    return (
        graph_ctes()
        + ","
        + _MASS_ORACLE.lstrip()
        + ","
        + _coherence_oracle_cte().lstrip()
        + f""",
membership AS (
  SELECT DISTINCT c.c_mktsegment AS seg, l.l_partkey AS pk
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
totals AS (SELECT seg, count(*) AS total FROM membership GROUP BY seg),
aff AS (
  SELECT a.seg AS seg_a, b.seg AS seg_b,
         count(*) / CAST(least(ta.total, tb.total) AS DOUBLE) AS affinity
  FROM membership a JOIN membership b ON a.pk = b.pk AND a.seg <> b.seg
  JOIN totals ta ON ta.seg = a.seg JOIN totals tb ON tb.seg = b.seg
  GROUP BY a.seg, b.seg, ta.total, tb.total
),
-- exposure must see the UNROUNDED affinity (A9 parity); only the
-- decision rule thresholds on the rounded value
aff_r AS (SELECT seg_a, seg_b, round(affinity, 6) AS affinity FROM aff),
activity AS (
  SELECT ontology AS seg, n_sources / CAST((SELECT max(n_sources) FROM mass_t) AS DOUBLE) AS act
  FROM mass_t
),
exposure AS (
  SELECT aff.seg_a AS ontology,
         sum(aff.affinity * act.act) / nullif(sum(aff.affinity), 0.0) AS exposure
  FROM aff JOIN activity act ON act.seg = aff.seg_b
  GROUP BY aff.seg_a
),
prot AS (
  SELECT m.ontology, c.coherence,
         round(1.0 / (1.0 + exp(-(m.mass * c.coherence))) - 0.6 * e.exposure, 6) AS protection
  FROM mass_t m
  JOIN coher c ON c.ontology = m.ontology
  JOIN exposure e ON e.ontology = m.ontology
),
top_aff AS (
  SELECT seg_a AS ontology, seg_b, affinity FROM (
    SELECT aff_r.*, row_number() OVER (PARTITION BY seg_a ORDER BY affinity DESC, seg_b) AS rn
    FROM aff_r) WHERE rn = 1
),
demo AS (
  SELECT 'demotion' AS kind,
         CASE WHEN p.coherence < 0.0 THEN 'DISSOLVE'
              WHEN t.affinity >= {MERGE_AFFINITY} THEN 'MERGE'
              ELSE 'ESCALATE' END AS verb,
         p.ontology AS subject,
         CASE WHEN p.coherence < 0.0 THEN '{PRIMORDIAL}'
              WHEN t.affinity >= {MERGE_AFFINITY} THEN t.seg_b
              ELSE 'review' END AS target,
         p.protection AS score
  FROM prot p LEFT JOIN top_aff t ON t.ontology = p.ontology
  WHERE p.protection < {DEMOTION_THRESHOLD}
),
deg AS (
  SELECT node_id, sum(c) AS total_degree FROM (
    SELECT src AS node_id, count(*) AS c FROM edges GROUP BY src
    UNION ALL
    SELECT dst, count(*) FROM edges GROUP BY dst) GROUP BY node_id
),
onames AS (SELECT DISTINCT lower(ontology) AS lname FROM nodes),
promo AS (
  SELECT 'promotion' AS kind, 'CLEAVE' AS verb,
         node_id AS subject, name AS target,
         CAST(total_degree AS DOUBLE) AS score
  FROM (
    SELECT n.node_id, n.name, n.ontology, d.total_degree,
           row_number() OVER (PARTITION BY n.ontology
                              ORDER BY d.total_degree DESC, n.node_id) AS rn
    FROM nodes n JOIN deg d ON d.node_id = n.node_id
    WHERE lower(n.name) NOT IN (SELECT lname FROM onames)
  ) WHERE rn <= 10 AND total_degree >= {MIN_DEGREE}
),
press AS (
  SELECT avgc, CASE
           WHEN avgc >= {PRESSURE_EMERGENCY} THEN 1.0
           WHEN avgc > {PRESSURE_COMFORT_MAX}
             THEN (avgc - {PRESSURE_COMFORT_MAX}) / ({PRESSURE_EMERGENCY} - {PRESSURE_COMFORT_MAX})
           WHEN avgc < {PRESSURE_COMFORT_MIN}
             THEN ({PRESSURE_COMFORT_MIN} - avgc) / {PRESSURE_COMFORT_MIN}
           ELSE 0.0 END AS p
  FROM (SELECT count(*) / CAST(count(DISTINCT ontology) AS DOUBLE) AS avgc FROM nodes)
),
pressure AS (
  SELECT 'pressure' AS kind, 'ADJUST_CONTROL' AS verb, 'cycle' AS subject,
         CASE WHEN p = 0.0 THEN 'comfort'
              WHEN avgc < {PRESSURE_COMFORT_MIN} THEN
                   CASE WHEN p < 0.5 THEN 'tight' ELSE 'over' END
              WHEN p < 0.3 THEN 'watch'
              WHEN p < 0.7 THEN 'tight'
              WHEN p < 0.9 THEN 'over'
              ELSE 'emergency' END AS target,
         round(p, 6) AS score
  FROM press
)
SELECT * FROM demo
UNION ALL SELECT * FROM promo
UNION ALL SELECT * FROM pressure
"""
    )


@query("an_annealing_cycle", oracle=_oracle())
def an_annealing_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full annealing cycle's proposal set: A9-driven demotion verbs
    (DISSOLVE / MERGE / ESCALATE via the deterministic decision mock),
    degree-driven CLEAVE promotions, and the ecological-pressure
    ADJUST_CONTROL signal. Proposals only — no graph mutation, matching
    the reference's propose→review→execute split."""
    return annealing_proposals(spark, sf_dir)


# ---------------------------------------------------------------------------
# Proposal execution (reference proposal_executor.py): approved verbs
# rewrite ontology membership as pure DataFrame transforms
# ---------------------------------------------------------------------------


def execute_demotions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the cycle's auto-approvable demotion verbs to the node
    table (`proposal_executor.py:295-650`): DISSOLVE routes the
    ontology's members to the primordial pool, MERGE reassigns them to
    the affinity partner, ESCALATE leaves the graph untouched (it waits
    for review — the hitl half of the reference's flow). CLEAVE is
    review-gated in the reference and is not auto-executed here either.
    Returns the post-execution ontology distribution — a full before/
    after diff would need the whole node table; the distribution is the
    deterministic summary the catalog rebuild (S8) would re-index."""
    ctx = Ctx.get(spark, sf_dir)
    demos = (
        annealing_proposals(spark, sf_dir)
        .filter(F.col("kind") == "demotion")
        .select(F.col("subject").alias("ontology"), "verb", "target")
    )
    rewritten = (
        ctx.nodes.join(F.broadcast(demos), "ontology", "left")
        .select(
            "node_id",
            F.when(F.col("verb") == "DISSOLVE", PRIMORDIAL)
            .when(F.col("verb") == "MERGE", F.col("target"))
            .otherwise(F.col("ontology"))
            .alias("ontology"),
        )
    )
    return rewritten.groupBy("ontology").agg(F.count("*").alias("n_nodes"))


def _exec_oracle() -> str:
    # reuse the full cycle oracle up to `demo`, then rewrite + count
    base = _oracle()
    cut = base.index("SELECT * FROM demo")
    return (
        base[:cut]
        + """
SELECT CASE WHEN d.verb = 'DISSOLVE' THEN 'primordial'
            WHEN d.verb = 'MERGE' THEN d.target
            ELSE n.ontology END AS ontology,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM nodes n LEFT JOIN demo d ON d.subject = n.ontology
GROUP BY 1
"""
    )


@query("an_execute_demotions", oracle=_exec_oracle())
def an_execute_demotions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The executor half of the annealing loop: the cycle's DISSOLVE /
    MERGE decisions applied to ontology membership, ESCALATE (and the
    review-gated CLEAVE) untouched — post-execution ontology counts."""
    return execute_demotions(spark, sf_dir)
