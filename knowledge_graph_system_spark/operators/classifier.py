"""A linear text classifier TRAINED IN-PLAN by fixed gradient-descent
sweeps — the fastText/CCNet shape of model-based corpus filtering.

The modern curation pipelines (CCNet — Wenzek et al. 2020; fastText
filters in GPT-3/LLaMA data work; DCLM / FineWeb-Edu classifier
filtering) share one mechanism: a linear model over cheap text
features is trained against a labeled slice (an LLM-judge quality
column, an LM-perplexity teacher, ground-truth tags) and then scores
the full corpus as a narrow row-local projection. This module is that
mechanism end-to-end, graded cross-engine:

- teacher = the graded quality heuristic (`operators/
  textstats.py:t_quality_score` arithmetic): y = 1 iff
  round(0.5·distinct_ratio + 0.5·least(n_words/60, 1), 6) >= 0.65 —
  the corpus-median cut at both gate SFs, so classes stay balanced.
  The teacher is a LINEAR function of two of the four features, so
  the learning problem is honest (GD must find the direction and
  ignore the two distractor features) yet learnable on THIS fixture —
  its synthetic bigram structure makes LM-perplexity and language
  teachers pure noise w.r.t. surface features (measured corr <= 0.11
  for every candidate pairing), so a "distill the LM" instance would
  grade a classifier that provably learns nothing. In production the
  teacher column swaps for the LLM-judge / perplexity slice and
  NOTHING in the plan shape changes;
- features = bias, length saturation least(n_words/60, 1), distinct
  ratio, avg-word-length/10 (the last a deliberate distractor) — all
  exact integer-division arithmetic, bit-identical across engines;
- training = `_SWEEPS` full-batch logistic-regression GD sweeps at a
  fixed learning rate, weights rounded to 12 dp after every update
  (the shared `semdedup.MEAN_ROUND_DP` discipline: distributed
  summation order and libm exp() differ by ULPs between runs and
  engines; per-sweep rounding makes the weight trajectory identical
  by construction). Each sweep is ONE corpus scan + a 4-row collect
  (per-feature mean gradient) — the kmeans/PQ bounded-collect budget.
  The weight vector rides a broadcast one-row frame, never the
  expression tree (the r12 codegen lesson);
- scoring = sigmoid(w·x) rounded to 6 dp, row-local — at 100 TB the
  trained weights ship as a constant and the scan is the only cost.

Determinism ledger: features and labels are pure functions of the
table; the mean gradient's ULP-level order noise is absorbed by the
12-dp weight rounding; the final probability is row-local off the
rounded weights. The oracle replays training as generated per-sweep
CTE blocks (the bpe/pq/kmeans pattern).

Reference parity: the reference has no model-based filtering surface;
this is pipeline-surface beyond it, like the dedup/ANN families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Ctx, query
from .semdedup import MEAN_ROUND_DP

_SWEEPS = 12
_LR = 8.0
_NFEAT = 4  # bias, length saturation, distinct ratio, awl/10
_TEACHER_CUT = 0.65  # ~the corpus median of the quality heuristic

_X_EXPR = (
    "array(1.0D,"
    " least(size(split(text, ' ')) / 60.0D, 1.0D),"
    " size(array_distinct(split(text, ' '))) / cast(size(split(text, ' ')) as double),"
    " (length(regexp_replace(text, ' ', '')) / cast(size(split(text, ' ')) as double)) / 10.0D)"
)

_X_SQL = (
    "[1.0,"
    " least(len(string_split(text, ' ')) / 60.0, 1.0),"
    " len(list_distinct(string_split(text, ' ')))"
    "   / CAST(len(string_split(text, ' ')) AS DOUBLE),"
    " (length(replace(text, ' ', ''))"
    "   / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 10.0]"
)

# y from x: quality = 0.5*distinct_ratio + 0.5*len_sat (the graded
# t_quality_score formula), 6-dp rounded before the cut on both engines
_Y_EXPR = f"round(0.5D * element_at(x, 3) + 0.5D * element_at(x, 2), 6) >= {_TEACHER_CUT}D"
_Y_SQL = f"round(0.5 * x[3] + 0.5 * x[2], 6) >= {_TEACHER_CUT}"

# sigmoid(w . x), row-local off the broadcast one-row weight frame
_P_EXPR = (
    "1.0D / (1.0D + exp(-aggregate(zip_with(x, w, (a, b) -> a * b),"
    " 0D, (acc, v) -> acc + v)))"
)


def _w_frame(spark: SparkSession, w: list[float]) -> DataFrame:
    return spark.createDataFrame([(w,)], "w array<double>")


def logreg_train(
    data: DataFrame, n_feat: int = _NFEAT, sweeps: int = _SWEEPS, lr: float = _LR
) -> list[float]:
    """Full-batch GD over (x array<double>, y boolean): the
    12-dp-rounded weight vector after `sweeps` updates from w = 0.
    BOUNDED COLLECTS: one n_feat-row mean-gradient aggregate per
    sweep."""
    spark = data.sparkSession
    w = [0.0] * n_feat
    for _ in range(sweeps):
        grad = (
            data.join(F.broadcast(_w_frame(spark, w)))
            .withColumn("p", F.expr(_P_EXPR))
            .select(
                F.posexplode("x").alias("j", "xj"),
                (F.col("p") - F.col("y").cast("double")).alias("err"),
            )
            .groupBy("j")
            .agg(F.avg(F.col("err") * F.col("xj")).alias("gj"))
            .collect()
        )
        g = {r["j"]: r["gj"] for r in grad}
        w = [
            round(w[j] - lr * g.get(j, 0.0), MEAN_ROUND_DP)
            for j in range(n_feat)
        ]
    return w


def logreg_score(data: DataFrame, w: list[float]) -> DataFrame:
    """(doc_id, p, pred, y): row-local scoring off trained weights."""
    return (
        data.join(F.broadcast(_w_frame(data.sparkSession, w)))
        .withColumn("__p", F.expr(_P_EXPR))
        .select(
            "doc_id",
            F.round("__p", 6).alias("p"),
            (F.col("__p") >= 0.5).alias("pred"),
            "y",
        )
    )


def t_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r14 candidate: the in-plan-trained quality classifier —
    per-source rollup (source, n_docs, n_pos, n_pred_pos, n_correct,
    mean_p) so the driver row stays small while every per-doc
    probability feeds the hash through mean_p."""
    ctx = Ctx.get(spark, sf_dir)
    docs = ctx.tables["documents"]
    data = (
        docs.select("doc_id", "source", F.expr(_X_EXPR).alias("x"))
        .withColumn("y", F.expr(_Y_EXPR))
        .localCheckpoint(eager=True)
    )
    w = logreg_train(data)
    scored = logreg_score(data, w)
    return (
        data.select("doc_id", "source")
        .join(scored, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("y").cast("bigint")).alias("n_pos"),
            F.sum(F.col("pred").cast("bigint")).alias("n_pred_pos"),
            F.sum((F.col("pred") == F.col("y")).cast("bigint")).alias(
                "n_correct"
            ),
            F.round(F.avg("p"), 6).alias("mean_p"),
        )
    )


def t_quality_logreg_oracle(sweeps: int = _SWEEPS, lr: float = _LR) -> str:
    """DuckDB twin, GD training INCLUDED as generated per-sweep CTE
    blocks: identical features, teacher cut, sigmoid, mean gradient,
    and 12-dp weight rounding, then the same per-source rollup."""
    p = "1.0 / (1.0 + exp(-list_dot_product(x, w)))"
    parts = [f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, source, x, {_Y_SQL} AS y FROM (
    SELECT doc_id, source, {_X_SQL} AS x FROM documents
  )
),
w0 AS (SELECT {[0.0] * _NFEAT}::DOUBLE[] AS w)"""]
    for t in range(1, sweeps + 1):
        parts.append(f""",
g{t} AS MATERIALIZED (
  SELECT j, avg(({p} - CAST(y AS DOUBLE)) * x[j]) AS gj
  FROM d CROSS JOIN w{t - 1}, range(1, {_NFEAT} + 1) AS r(j)
  GROUP BY j
),
w{t} AS (
  SELECT list(round(w.w[g.j] - {lr} * g.gj, {MEAN_ROUND_DP}) ORDER BY g.j) AS w
  FROM g{t} g CROSS JOIN w{t - 1} w
)""")
    parts.append(f""",
scored AS (
  SELECT doc_id, source, round({p}, 6) AS p, ({p} >= 0.5) AS pred, y
  FROM d CROSS JOIN w{sweeps}
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS n_pos,
       CAST(sum(CAST(pred AS BIGINT)) AS BIGINT) AS n_pred_pos,
       CAST(sum(CAST(pred = y AS BIGINT)) AS BIGINT) AS n_correct,
       round(avg(p), 6) AS mean_p
FROM scored GROUP BY source
""")
    return "".join(parts)


# Registered r14 (the pre-computed window's second new slot — the
# registration also added `classifier` to load_all()'s import list;
# probed at final code through tools/probe_candidate.py).
query("t_quality_logreg", oracle=t_quality_logreg_oracle())(t_quality_logreg)
