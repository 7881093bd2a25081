"""SQ8 scalar-quantized ANN (operators/quant.py) — prepared r12
registry candidate: driver-style oracle compares at both gate scale
factors plus the quantization-error and recall contracts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _oracle_rows(sql: str, sf: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_r12_candidate_ann_sq8(spark):
    """Driver-style compare for the prepared ann_sq8_topk row at BOTH
    gate scale factors: the full bounds → encode → decode → approx
    top-C → exact top-k chain, hash-exact against the DuckDB twin."""
    from knowledge_graph_system_spark.operators.quant import (
        ann_sq8_topk,
        ann_sq8_topk_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, ann_sq8_topk(spark, sf).collect()))
        want = sorted(map(tuple, _oracle_rows(ann_sq8_topk_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_sq8_codes_in_range_and_decode_error_bounded(spark):
    """Every code lands in [0, 255]; decoded values deviate from the
    original by at most half a quantization step per dimension."""
    from knowledge_graph_system_spark.operators.ann import _vectors
    from knowledge_graph_system_spark.operators.quant import (
        _DECODE,
        _bounds_cols,
        sq8_bounds,
        sq8_encode,
    )
    from knowledge_graph_system_spark.registry import Ctx

    ctx = Ctx.get(spark, SF)
    vecs = _vectors(ctx).drop("label")
    bounds = sq8_bounds(vecs)
    codes = sq8_encode(vecs, bounds)
    bad = codes.filter(
        F.exists("codes", lambda c: (c < 0) | (c > 255))
    ).count()
    assert bad == 0

    mns, mxs = _bounds_cols(bounds)
    decoded = codes.select("vec_id", "codes", mns, mxs).select(
        "vec_id", F.expr(_DECODE).alias("vhat")
    )
    step = max((mx - mn) / 255.0 for mn, mx in bounds)
    worst = (
        vecs.join(decoded, "vec_id")
        .select(
            F.expr(
                "aggregate(zip_with(v, vhat, (x, y) -> abs(x - y)), 0D,"
                " (acc, x) -> greatest(acc, x))"
            ).alias("err")
        )
        .agg(F.max("err"))
        .collect()[0][0]
    )
    assert worst <= step / 2.0 + 1e-9


def test_sq8_recall_vs_brute(spark):
    """The exact re-rank repairs the quantization error: per-query
    top-10 overlap with the exact brute-force row is >= 9/10 at both
    gate scale factors (on this corpus it is exact at sf0.001)."""
    from knowledge_graph_system_spark.operators.ann import _QUERY_IDS, ann_brute_topk
    from knowledge_graph_system_spark.operators.quant import ann_sq8_topk

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        brute = {
            (r["query_id"], r["vec_id"]) for r in ann_brute_topk(spark, sf).collect()
        }
        sq8 = {(r["query_id"], r["vec_id"]) for r in ann_sq8_topk(spark, sf).collect()}
        # seed per_q with every query id brute returned — a query with
        # ZERO overlap must fail the bound, not vanish from the min
        # (ADVICE r10); and all expected query ids must be present
        per_q: dict[int, int] = {q: 0 for q, _v in brute}
        assert set(per_q) == set(_QUERY_IDS)
        for q, v in brute & sq8:
            per_q[q] += 1
        assert min(per_q.values()) >= 9, per_q


def test_sq8_encode_clamps_out_of_bounds(spark):
    """Encode is write-time against FROZEN bounds: a vector appended
    after the bounds froze may fall outside the per-dim [min, max] and
    must clamp to the [0, 255] code range, not emit out-of-range codes
    silently (ADVICE r10). Also pins that the transform length derives
    from len(bounds) — a 2-dim table works though the fixture is
    64-dim."""
    from knowledge_graph_system_spark.operators.quant import sq8_encode

    bounds = [(0.0, 1.0), (2.0, 2.0)]  # second dimension degenerate
    vecs = spark.createDataFrame(
        [(1, [-5.0, 9.0]), (2, [0.5, 2.0]), (3, [7.0, -1.0])],
        "vec_id long, v array<double>",
    )
    rows = {r["vec_id"]: r["codes"] for r in sq8_encode(vecs, bounds).collect()}
    assert rows[1] == [0, 0]    # below min clamps to 0; degenerate -> 0
    assert rows[2] == [128, 0]  # in-range: floor(127.5 + 0.5) = 128
    assert rows[3] == [255, 0]  # above max clamps to 255
