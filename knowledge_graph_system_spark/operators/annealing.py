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

The LLM verb decision is mocked deterministically (U1/U4 policy) and
covers the reference's FULL closed six-verb vocabulary
(`annealing_decision_service.py` system prompt). For each demotion
candidate (protection < t), an ordered cascade:
  coherence < −0.001 (beyond noise floor)   → DISSOLVE into 'primordial'
  coherence < 0, hub dominance ≥ 0.0065     → RENAME to the hub concept
    (the ontology's top-degree concept owns enough of its degree mass
     that the name should follow the hub)
  coherence < 0 otherwise                   → ESCALATE to review
  re-score protection + 10·coherence ≥ 0    → NO_ACTION (candidate
    clears the bar once coherence is re-weighted — the reference's
    "re-evaluate before acting" branch)
  re-score ≥ −0.05 AND top affinity ≥ 0.5   → MERGE into that partner
    (recoverable, and a strong partner exists)
  otherwise                                 → ESCALATE to review
Plus, outside the demotion family:
  top-degree concept ≥ floor                → CLEAVE (new nucleus)
  pressure signal                           → ADJUST_CONTROL (zone label)
Thresholds are fixture-calibrated the same way MERGE_AFFINITY always
was; the point is a deterministic, oracle-reproducible stand-in for
the LLM's judgment, not its cleverness. Proposals only — execution is
the separate executor below, exactly like the reference's
propose→review→execute split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import oracle_snippets as osql
from ..functions.scale import maybe_broadcast
from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes

DEMOTION_THRESHOLD = 0.15   # reference default (`run_annealing_cycle`)
MERGE_AFFINITY = 0.5
MIN_DEGREE = 40
DISSOLVE_COHERENCE = -0.001  # incoherence beyond the noise floor
RENAME_DOMINANCE = 0.0065    # hub's share of its ontology's degree mass
RESCUE_WEIGHT = 10.0         # coherence re-weight in the NO_ACTION re-score
MERGE_RESCUE_FLOOR = -0.05   # re-score above which MERGE beats ESCALATE
PRIMORDIAL = "primordial"   # reference primordial_pool_name

# A cleave's moved set (the nucleus' 1-hop neighborhood) above this
# row count loses the broadcast hint — a hub nucleus at corpus scale
# can out-degree any sane broadcast, so past the bound the membership
# rewrite joins by shuffle instead.
MOVED_BROADCAST_MAX = 2_000_000
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

    # node + degree frame, shared by the RENAME dominance signal, the
    # per-ontology mass totals and the promotion scan — checkpoint once
    # (the r16 plan re-ran the degree aggregation + join for each of
    # the three consumers; r17, guide §1/§2.4). Its materialization is
    # independent of the A9 scoring pipeline, so the two eager chains
    # overlap in two threads (r17, guide §2.6).
    def _named() -> DataFrame:
        deg = degrees(ctx.edges)
        return (
            ctx.nodes.select("node_id", "name", "ontology")
            .join(deg, "node_id")
            .localCheckpoint(eager=True)
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _f_named = _pool.submit(_named)
        _f_paff = _pool.submit(protection_with_affinity, spark, sf_dir)
        named = _f_named.result()
        scores, aff_raw = _f_paff.result()

    # hub dominance: each ontology's top-degree concept and its share of
    # the ontology's total degree mass (the RENAME signal — reference
    # RENAME proposals fire when an ontology's name has drifted from its
    # actual center of gravity, `annealing_manager.py:70-150` vocabulary)
    wd1 = Window.partitionBy("ontology").orderBy(
        F.col("total_degree").desc(), F.col("node_id")
    )
    tot = named.groupBy("ontology").agg(F.sum("total_degree").alias("_tot"))
    hub = (
        named.withColumn("rn", F.row_number().over(wd1))
        .filter(F.col("rn") == 1)
        .join(tot, "ontology")
        .select(
            "ontology",
            F.col("name").alias("hub_name"),
            F.round(F.col("total_degree") / F.col("_tot"), 6).alias("dominance"),
        )
    )

    # -- demotion: A9 scores + best affinity partner per ontology; the
    # affinity frame is the one A9 itself was computed from (shared via
    # protection_with_affinity — no second membership self-join), with
    # the decision-rule comparisons on ROUNDED values so both engines
    # threshold identically (scores/aff_raw were built in the
    # overlapped thread above)
    aff = aff_raw.select(
        "seg_a", "seg_b", F.round("affinity", 6).alias("affinity")
    )
    wa = Window.partitionBy("seg_a").orderBy(F.col("affinity").desc(), F.col("seg_b"))
    top_aff = (
        aff.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select(F.col("seg_a").alias("ontology"), "seg_b", "affinity")
    )
    rescored = F.round(
        F.col("protection") + F.lit(RESCUE_WEIGHT) * F.col("coherence"), 6
    )
    demo = (
        scores.filter(F.col("protection") < DEMOTION_THRESHOLD)
        .join(top_aff, "ontology", "left")
        .join(F.broadcast(hub), "ontology", "left")
        .select(
            F.lit("demotion").alias("kind"),
            F.when(F.col("coherence") < DISSOLVE_COHERENCE, "DISSOLVE")
            .when(
                (F.col("coherence") < 0.0)
                & (F.col("dominance") >= RENAME_DOMINANCE),
                "RENAME",
            )
            .when(F.col("coherence") < 0.0, "ESCALATE")
            .when(rescored >= 0.0, "NO_ACTION")
            .when(
                (rescored >= MERGE_RESCUE_FLOOR)
                & (F.col("affinity") >= MERGE_AFFINITY),
                "MERGE",
            )
            .otherwise("ESCALATE")
            .alias("verb"),
            F.col("ontology").alias("subject"),
            F.when(F.col("coherence") < DISSOLVE_COHERENCE, PRIMORDIAL)
            .when(
                (F.col("coherence") < 0.0)
                & (F.col("dominance") >= RENAME_DOMINANCE),
                F.col("hub_name"),
            )
            .when(F.col("coherence") < 0.0, "review")
            .when(rescored >= 0.0, "none")
            .when(
                (rescored >= MERGE_RESCUE_FLOOR)
                & (F.col("affinity") >= MERGE_AFFINITY),
                F.col("seg_b"),
            )
            .otherwise("review")
            .alias("target"),
            F.col("protection").alias("score"),
        )
    )

    # -- promotion: per-ontology top-10 degree concepts above the floor,
    # excluding names that already ARE an ontology
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
deg AS (
  SELECT node_id, sum(c) AS total_degree FROM (
    SELECT src AS node_id, count(*) AS c FROM edges GROUP BY src
    UNION ALL
    SELECT dst, count(*) FROM edges GROUP BY dst) GROUP BY node_id
),
dom AS (
  SELECT ontology, name AS hub_name,
         round(total_degree / CAST(tot AS DOUBLE), 6) AS dominance
  FROM (
    SELECT n.ontology, n.name, d.total_degree,
           sum(d.total_degree) OVER (PARTITION BY n.ontology) AS tot,
           row_number() OVER (PARTITION BY n.ontology
                              ORDER BY d.total_degree DESC, n.node_id) AS rn
    FROM nodes n JOIN deg d ON d.node_id = n.node_id
  ) WHERE rn = 1
),
demo AS (
  SELECT 'demotion' AS kind,
         CASE WHEN p.coherence < {DISSOLVE_COHERENCE} THEN 'DISSOLVE'
              WHEN p.coherence < 0.0 AND dm.dominance >= {RENAME_DOMINANCE} THEN 'RENAME'
              WHEN p.coherence < 0.0 THEN 'ESCALATE'
              WHEN round(p.protection + {RESCUE_WEIGHT} * p.coherence, 6) >= 0.0 THEN 'NO_ACTION'
              WHEN round(p.protection + {RESCUE_WEIGHT} * p.coherence, 6) >= {MERGE_RESCUE_FLOOR}
                   AND t.affinity >= {MERGE_AFFINITY} THEN 'MERGE'
              ELSE 'ESCALATE' END AS verb,
         p.ontology AS subject,
         CASE WHEN p.coherence < {DISSOLVE_COHERENCE} THEN '{PRIMORDIAL}'
              WHEN p.coherence < 0.0 AND dm.dominance >= {RENAME_DOMINANCE} THEN dm.hub_name
              WHEN p.coherence < 0.0 THEN 'review'
              WHEN round(p.protection + {RESCUE_WEIGHT} * p.coherence, 6) >= 0.0 THEN 'none'
              WHEN round(p.protection + {RESCUE_WEIGHT} * p.coherence, 6) >= {MERGE_RESCUE_FLOOR}
                   AND t.affinity >= {MERGE_AFFINITY} THEN t.seg_b
              ELSE 'review' END AS target,
         p.protection AS score
  FROM prot p LEFT JOIN top_aff t ON t.ontology = p.ontology
  LEFT JOIN dom dm ON dm.ontology = p.ontology
  WHERE p.protection < {DEMOTION_THRESHOLD}
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


def execute_proposals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the cycle's executable verbs to the node table
    (`proposal_executor.py:295-650`):

    - DISSOLVE routes the ontology's members to the primordial pool;
    - MERGE reassigns them to the affinity partner;
    - RENAME relabels the ontology to its hub concept's name;
    - CLEAVE (review-gated in the reference; here the deterministic
      approval mock approves exactly the top-scoring proposal, ties by
      subject) carves a new ontology named after the nucleus concept
      out of the nucleus plus its 1-hop neighborhood — the reference's
      new-nucleus membership rewrite;
    - ESCALATE and NO_ACTION leave the graph untouched (the hitl half
      of the reference's flow).

    A cleaved node wins over a demotion rewrite of its old ontology
    (the new nucleus pulls its neighborhood regardless — reference
    executes CLEAVE as a standalone transaction after demotions).
    Returns the post-execution ontology distribution — a full before/
    after diff would need the whole node table; the distribution is the
    deterministic summary the catalog rebuild (S8) would re-index."""
    ctx = Ctx.get(spark, sf_dir)
    # proposal rows are |ontologies| + 10·|ontologies| + 1 — tiny; the
    # r16 plan re-ran the whole scoring pipeline for each of the two
    # filters below (demos in the final action, cleave inside moved's
    # checkpoint). Materialize once (r17, guide §1/§2.4).
    props = annealing_proposals(spark, sf_dir).localCheckpoint(eager=True)
    demos = (
        props.filter(F.col("kind") == "demotion")
        .select(F.col("subject").alias("ontology"), "verb", "target")
    )
    # approval mock: the single top-scoring CLEAVE proposal is approved
    wc = Window.orderBy(F.col("score").desc(), F.col("subject"))
    cleave = (
        props.filter(F.col("verb") == "CLEAVE")
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .select(F.col("subject").alias("nucleus"), F.col("target").alias("new_onto"))
    )
    e = ctx.edges
    moved = (
        e.join(F.broadcast(cleave), e["src"] == F.col("nucleus"))
        .select(F.col("dst").alias("node_id"), "new_onto")
        .unionByName(
            e.join(F.broadcast(cleave), e["dst"] == F.col("nucleus")).select(
                F.col("src").alias("node_id"), "new_onto"
            )
        )
        .unionByName(cleave.select(F.col("nucleus").alias("node_id"), "new_onto"))
        .groupBy("node_id")
        .agg(F.min("new_onto").alias("new_onto"))
        # the moved set = the nucleus' 1-hop neighborhood — hub-degree-
        # sized, so the broadcast is counted, not forced (the shared
        # functions/scale.py guard class); checkpoint shares the
        # neighborhood aggregation between the count and the join
        .localCheckpoint(eager=True)
    )
    rewritten = (
        ctx.nodes.join(F.broadcast(demos), "ontology", "left")
        .join(maybe_broadcast(moved, MOVED_BROADCAST_MAX), "node_id", "left")
        .select(
            "node_id",
            F.coalesce(
                F.col("new_onto"),
                F.when(F.col("verb") == "DISSOLVE", PRIMORDIAL)
                .when(F.col("verb").isin("MERGE", "RENAME"), F.col("target"))
                .otherwise(F.col("ontology")),
            ).alias("ontology"),
        )
    )
    return rewritten.groupBy("ontology").agg(F.count("*").alias("n_nodes"))


def _exec_oracle() -> str:
    # reuse the full cycle oracle's CTE prefix (everything before the
    # final proposal-union SELECT), then approve + rewrite + count
    base = _oracle()
    cut = base.index("SELECT * FROM demo")
    return (
        base[:cut]
        + """,
cleave AS (
  SELECT subject AS nucleus, target AS new_onto FROM (
    SELECT promo.*, row_number() OVER (ORDER BY score DESC, subject) AS rn
    FROM promo) WHERE rn = 1
),
moved AS (
  SELECT node_id, min(new_onto) AS new_onto FROM (
    SELECT e.dst AS node_id, c.new_onto FROM edges e JOIN cleave c ON e.src = c.nucleus
    UNION ALL
    SELECT e.src, c.new_onto FROM edges e JOIN cleave c ON e.dst = c.nucleus
    UNION ALL
    SELECT nucleus, new_onto FROM cleave
  ) GROUP BY node_id
)
SELECT CASE WHEN m.new_onto IS NOT NULL THEN m.new_onto
            WHEN d.verb = 'DISSOLVE' THEN 'primordial'
            WHEN d.verb IN ('MERGE', 'RENAME') THEN d.target
            ELSE n.ontology END AS ontology,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM nodes n LEFT JOIN demo d ON d.subject = n.ontology
LEFT JOIN moved m ON m.node_id = n.node_id
GROUP BY 1
"""
    )


@query("an_execute_proposals", oracle=_exec_oracle())
def an_execute_proposals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The executor half of the annealing loop (r5's
    `an_execute_demotions`, renamed now that it covers the full
    executable vocabulary): DISSOLVE / MERGE / RENAME applied to
    ontology membership, the approved CLEAVE's new-nucleus neighborhood
    rewrite, ESCALATE / NO_ACTION untouched — post-execution ontology
    counts."""
    return execute_proposals(spark, sf_dir)
