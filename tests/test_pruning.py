"""U4 pruning strategy matrix (reference `pruning_strategies.py:241-875`):
mode × strength × value branches on a crafted vocabulary."""

from __future__ import annotations

from types import SimpleNamespace

import pytest

from knowledge_graph_system_spark.operators.pruning import pruning_recommendations


@pytest.fixture(scope="module")
def fake_ctx(spark):
    """4-type vocabulary with controlled similarities and value scores:
    STRONG/LIKE  sim 1.0   (strong pair)
    STRONG/NEAR  sim ~0.28 (moderate, above AI_MERGE_T)
    STRONG/FAR   sim ~0.15 (moderate, below AI_MERGE_T)  [via NEAR/FAR too]
    ORPHAN       zero edges, non-builtin  -> prune
    BUILTIN      zero edges, builtin      -> skip
    """
    import math

    def unit(x, y):
        n = math.hypot(x, y)
        return [x / n, y / n]

    vocab = spark.createDataFrame(
        [
            ("STRONG", "semantic", unit(1.0, 0.0)),
            ("LIKE", "semantic", unit(1.0, 0.0)),       # sim(STRONG)=1.0
            ("NEAR", "semantic", unit(0.96, 0.28)),     # sim(STRONG)≈0.96? -> strong
            ("FARISH", "semantic", unit(0.28, 0.96)),   # sim(STRONG)≈0.28 -> ai-merge band
            ("ORTHO", "semantic", unit(0.0, 1.0)),      # sim(STRONG)=0.0 -> weak
            ("BUILTIN", "structural", unit(-1.0, 0.0)),
            ("ORPHAN", "semantic", unit(-0.6, 0.8)),
        ],
        "rel_type string, category string, embedding array<double>",
    )
    # edge rows: STRONG rich (low value anyway at this scale), LIKE light,
    # ORPHAN/BUILTIN absent (zero edges)
    rows = []
    for i in range(5):
        rows.append((f"s{i}", "x", "STRONG", 1.0))
    for i in range(3):
        rows.append((f"l{i}", "x", "LIKE", 1.0))
    rows += [("n0", "x", "NEAR", 1.0), ("f0", "x", "FARISH", 1.0), ("o0", "x", "ORTHO", 1.0)]
    edges = spark.createDataFrame(rows, "src string, dst string, rel_type string, confidence double")
    return SimpleNamespace(vocab=vocab, edges=edges)


def _rows(df):
    return {
        (r["action"], r["subject"], r["target"], r["review"], r["auto_execute"])
        for r in df.collect()
    }


def test_aitl_matrix(fake_ctx):
    got = _rows(pruning_recommendations(fake_ctx, mode="aitl"))
    # strong pair auto-merges; preserve = higher value (STRONG has 5 edges
    # vs LIKE 3 -> STRONG value higher -> LIKE deprecated), review none
    assert ("merge", "LIKE", "STRONG", "none", True) in got
    # zero-edge non-builtin -> auto-prune
    assert ("prune", "ORPHAN", None, "none", True) in got
    # zero-edge builtin -> skip, never pruned
    assert ("skip", "BUILTIN", None, "none", False) in got
    # every type here is low-value -> non-zero-edge ones get the mocked
    # AI review: value_score < AI_DEPRECATE_T -> deprecate
    assert ("deprecate", "ORTHO", None, "ai", True) in got


def test_naive_matrix(fake_ctx):
    got = _rows(pruning_recommendations(fake_ctx, mode="naive"))
    # strong still auto-merges
    assert ("merge", "LIKE", "STRONG", "none", True) in got
    # moderate pairs are skipped in naive mode (no ai review exists)
    assert not any(r for r in got if r[3] == "ai")
    # zero-edge prune still automatic; low-value-with-edges skipped
    assert ("prune", "ORPHAN", None, "none", True) in got
    assert not any(r[0] == "deprecate" for r in got)


def test_hitl_matrix(fake_ctx):
    got = _rows(pruning_recommendations(fake_ctx, mode="hitl"))
    # nothing auto-executes in HITL mode
    assert not any(r[4] for r in got)
    # strong merge exists but needs human review
    assert ("merge", "LIKE", "STRONG", "human", False) in got
    # low-value with edges -> deprecate pending human approval
    assert any(r[0] == "deprecate" and r[3] == "human" for r in got)
    # builtin still plain skip
    assert ("skip", "BUILTIN", None, "none", False) in got


def test_bad_mode_rejected(fake_ctx):
    with pytest.raises(ValueError):
        pruning_recommendations(fake_ctx, mode="yolo")
