"""Product-quantized ANN (operators/pq.py) — prepared r13 registry
candidate: driver-style oracle compares at both gate scale factors
plus the code-range, pure-Python encode parity, and recall contracts."""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def _oracle_rows(sql: str, sf: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_r13_candidate_ann_pq(spark):
    """Driver-style compare for the prepared ann_pq_topk row at BOTH
    gate scale factors: codebook → encode → reconstruct → approx top-C
    → exact top-k, hash-exact against the self-contained DuckDB twin."""
    from knowledge_graph_system_spark.operators.pq import (
        ann_pq_topk,
        ann_pq_topk_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, ann_pq_topk(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(ann_pq_topk_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_pq_codes_shape_and_python_parity(spark):
    """Every vector gets exactly M codes in [1, K], and the Spark
    argmin-encode agrees with an independent pure-Python reference
    (same 6-dp rounding, same smallest-index tie-break)."""
    from knowledge_graph_system_spark.operators.ann import _vectors
    from knowledge_graph_system_spark.operators.pq import (
        _M,
        _SUB,
        pq_codebook,
        pq_encode,
    )
    from knowledge_graph_system_spark.registry import Ctx

    ctx = Ctx.get(spark, SF)
    vecs = _vectors(ctx)
    cb = pq_codebook(vecs)
    k = len(cb[0])
    assert len(cb) == _M and all(len(code) == _SUB for sub in cb for code in sub)

    got = {r["vec_id"]: r["codes"] for r in pq_encode(vecs, cb).collect()}
    raw = {r["vec_id"]: r["v"] for r in vecs.collect()}
    assert set(got) == set(raw)
    for vid, codes in got.items():
        assert len(codes) == _M
        assert all(1 <= c <= k for c in codes)
        v = raw[vid]
        for m in range(_M):
            sub = v[m * _SUB : (m + 1) * _SUB]
            dists = [
                round(sum((x - c) * (x - c) for x, c in zip(sub, cw)), 6)
                for cw in cb[m]
            ]
            assert codes[m] == dists.index(min(dists)) + 1, (vid, m)


def test_pq_empty_cluster_carries_forward(spark):
    """A codeword that attracts no subvectors keeps its previous value
    (the bpe.py exhausted-merge discipline): two identical seeds make
    codeword 2 unreachable (ties break to j=1), so after Lloyd it must
    still equal the seed, not NaN or zero out."""
    from knowledge_graph_system_spark.operators.pq import (
        _M,
        _SUB,
        pq_codebook,
    )

    base = [float(i % 7) for i in range(64)]
    other = [float((i * 3) % 5) + 1.0 for i in range(64)]
    vecs = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], "vec_id long, v array<double>"
    )
    cb = pq_codebook(vecs, k=2, iters=1)
    for m in range(_M):
        seed2 = base[m * _SUB : (m + 1) * _SUB]
        assert cb[m][1] == seed2  # carried forward, never re-meaned
        # codeword 1 is the mean of its assignees {v1, v2, v3}
        want = [
            (2 * base[m * _SUB + s] + other[m * _SUB + s]) / 3.0
            for s in range(_SUB)
        ]
        assert all(abs(a - b) < 1e-12 for a, b in zip(cb[m][0], want))


def test_pq_recall_vs_brute(spark):
    """The exact re-rank repairs the quantization error: per-query
    top-10 overlap with the exact brute-force row is >= 9/10 at both
    gate scale factors (measured 10/10; the label-mean quantizer the
    IVF/SemDeDup legs use was REJECTED for this row at 4-6/10 even
    with a half-corpus slice — see the module docstring)."""
    from knowledge_graph_system_spark.operators.ann import _QUERY_IDS, ann_brute_topk
    from knowledge_graph_system_spark.operators.pq import ann_pq_topk

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        brute = {
            (r["query_id"], r["vec_id"]) for r in ann_brute_topk(spark, sf).collect()
        }
        pq = {(r["query_id"], r["vec_id"]) for r in ann_pq_topk(spark, sf).collect()}
        per_q: dict[int, int] = {q: 0 for q, _v in brute}
        assert set(per_q) == set(_QUERY_IDS)
        for q, v in brute & pq:
            per_q[q] += 1
        assert min(per_q.values()) >= 9, per_q


def test_pq_plan_is_jvm_side(spark):
    """Encode/reconstruct are literal-codebook projections: no Python
    evaluation anywhere, no cartesian product (the |q|×N scoring cross
    join is a BroadcastNestedLoopJoin on the 3-row query frame)."""
    from knowledge_graph_system_spark.operators.pq import ann_pq_topk

    df = ann_pq_topk(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_pq_compression_ratio_documented():
    """The scan-byte contract the module docstring claims: M codes per
    vector vs D float64s — 64× at the fixture shape."""
    from knowledge_graph_system_spark.operators.pq import _M, _SUB
    from knowledge_graph_system_spark.operators.quant import _DIM

    assert _M * _SUB == _DIM
    assert (_DIM * 8) / _M == 64.0


def test_pq_saved_codebook_identity(spark, tmp_path):
    """save → load roundtrips the codebook exactly, and the loaded-
    codebook query path is row-identical to inline training (the
    save_bpe / persisted-IVF write-once contract)."""
    from knowledge_graph_system_spark.functions.scale import fan_out
    from knowledge_graph_system_spark.operators.ann import _vectors
    from knowledge_graph_system_spark.operators.pq import (
        ann_pq_topk,
        load_codebook,
        pq_codebook,
        pq_topk_from_saved,
        save_codebook,
    )
    from knowledge_graph_system_spark.registry import Ctx

    ctx = Ctx.get(spark, SF)
    vecs = fan_out(_vectors(ctx).drop("label")).localCheckpoint(eager=True)
    cb = pq_codebook(vecs)
    path = str(tmp_path / "pq_codebook")
    save_codebook(cb, spark, path)
    assert load_codebook(spark, path) == cb

    inline = sorted(map(tuple, ann_pq_topk(spark, SF).collect()))
    saved = sorted(map(tuple, pq_topk_from_saved(spark, SF, path).collect()))
    assert inline == saved and len(inline) == 30


# ---------------------------------------------------------------------------
# IVFPQ (prepared r14 candidate): the coarse-cell x PQ-code composition.
# ---------------------------------------------------------------------------


def test_r14_candidate_ann_ivfpq(spark):
    """Driver-style compare for the prepared ann_ivfpq_topk row at BOTH
    gate scale factors: IVF probe x PQ approximate scoring within the
    probed cells x exact re-rank, hash-exact against the DuckDB twin
    (which byte-shares the PQ training prefix with ann_pq_topk)."""
    from knowledge_graph_system_spark.operators.pq import (
        ann_ivfpq_topk,
        ann_ivfpq_topk_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, ann_ivfpq_topk(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(ann_ivfpq_topk_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_ivfpq_recall_vs_exact_ivf(spark):
    """The PQ approximation must not lose what cell pruning kept: the
    IVFPQ top-10 equals the SAME-CELLS exact IVF row's top-10 at both
    gate scale factors (measured 30/30 pairs; the C = 15k candidate
    slice inside 2 probed cells covers the coarse reconstruction's
    rank noise). Recall vs BRUTE is bounded by the IVF row's own cell
    recall by construction — the composition adds no new loss here."""
    from knowledge_graph_system_spark.operators.ann import ann_ivf_topk
    from knowledge_graph_system_spark.operators.pq import ann_ivfpq_topk

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ivf = {
            (r["query_id"], r["vec_id"]) for r in ann_ivf_topk(spark, sf).collect()
        }
        ivfpq = {
            (r["query_id"], r["vec_id"])
            for r in ann_ivfpq_topk(spark, sf).collect()
        }
        assert ivf == ivfpq


def test_ivfpq_plan_is_jvm_side_and_cell_pruned(spark):
    """No Python eval, no cartesian; the probe restriction is a real
    equi-join on the cell label (the partition-pruning key at write
    time), and the probe/query frames ride broadcast hints."""
    from knowledge_graph_system_spark.operators.pq import ann_ivfpq_topk

    df = ann_ivfpq_topk(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
