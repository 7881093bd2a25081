"""Bloom-filter decontamination (operators/bloom.py) — prepared r16
registry candidate: driver-style oracle compares plus the
no-false-negative, FP-rate, sizing, and determinism contracts."""

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


def test_r16_candidate_cur_bloom_decontaminate(spark):
    """Driver-style compare at BOTH gate scale factors: the physical
    broadcast-bitmap membership (Spark) and the position-set join
    formulation (DuckDB) produce identical flags — false positives
    included — because bit b set <=> b in the distinct eval position
    set."""
    from knowledge_graph_system_spark.operators.bloom import (
        cur_bloom_decontaminate,
        cur_bloom_decontaminate_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, cur_bloom_decontaminate(spark, sf).collect()))
        want = sorted(
            map(tuple, _oracle_rows(cur_bloom_decontaminate_oracle(), sf))
        )
        assert len(got) > 0 and got == want


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """A Bloom filter never misses a true member: per doc,
    bloom_hits >= exact_hits, and every exactly-contaminated doc is
    bloom-flagged. The measured gram-level FP rate sits near the
    _BITS_PER_GRAM = 10 design point (~0.9%; assert < 3% to stay
    weather-proof while catching a broken hash family, whose rate
    would be ~100x off in either direction)."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.bloom import (
        bloom_decontaminate,
    )
    from knowledge_graph_system_spark.registry import Ctx

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = Ctx.get(spark, sf).tables["documents"]
        per_doc = bloom_decontaminate(
            docs.filter(F.col("doc_id") % 25 != 0),
            docs.filter(F.col("doc_id") % 25 == 0),
        ).collect()
        assert all(r["bloom_hits"] >= r["exact_hits"] for r in per_doc)
        assert all(r["bloom_hits"] > 0 for r in per_doc if r["exact_hits"] > 0)
        n_grams = sum(r["n_grams"] for r in per_doc)
        fp = sum(r["bloom_hits"] - r["exact_hits"] for r in per_doc)
        assert n_grams > 0
        assert fp / n_grams < 0.03
        assert fp > 0  # the observable is non-degenerate at gate SFs


def test_bloom_bitmap_sizing_and_broadcast_bytes(spark):
    """The bitmap self-sizes to _BITS_PER_GRAM bits per distinct eval
    gram (words array = ceil(m/64) longs) and ships FAR fewer bytes
    than the distinct gram strings the exact path broadcasts — the
    whole point of the operator."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.bloom import (
        _BITS_PER_GRAM,
        bloom_build,
    )
    from knowledge_graph_system_spark.operators.curation import word_ngrams
    from knowledge_graph_system_spark.registry import Ctx

    docs = Ctx.get(spark, SF).tables["documents"]
    ev_grams = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.explode(word_ngrams(F.col("text"), 8)).alias("gram")
    )
    distinct = ev_grams.distinct()
    n = distinct.count()
    row = bloom_build(ev_grams, spark).collect()[0]
    m = row["m"]
    assert m == max(64, _BITS_PER_GRAM * n)
    assert len(row["w"]) == (m + 63) // 64
    bitmap_bytes = 8 * len(row["w"])
    string_bytes = sum(
        len(r["gram"]) for r in distinct.collect()
    )
    assert bitmap_bytes * 5 < string_bytes  # >5x smaller even at gate size


def test_bloom_build_is_deterministic_and_plan_jvm_side(spark):
    """Repartitioned input yields the identical bitmap (pure function
    of the gram set), and the candidate's executed plan stays
    JVM-side."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.bloom import (
        bloom_build,
        cur_bloom_decontaminate,
    )
    from knowledge_graph_system_spark.operators.curation import word_ngrams
    from knowledge_graph_system_spark.registry import Ctx

    docs = Ctx.get(spark, SF).tables["documents"]
    ev = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.explode(word_ngrams(F.col("text"), 8)).alias("gram")
    )
    a = bloom_build(ev, spark).collect()[0]
    b = bloom_build(ev.repartition(7), spark).collect()[0]
    assert a["m"] == b["m"] and a["w"] == b["w"]

    plan = (
        cur_bloom_decontaminate(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bloom_build_refuses_oversized_eval_sets(spark, monkeypatch):
    """The gram-count guard refuses loudly before building a bitmap
    that would outgrow the broadcast budget (the r10 unguarded-collect
    class — review finding r14)."""
    import pytest

    from knowledge_graph_system_spark.operators import bloom as bl

    grams = spark.createDataFrame(
        [(f"g{i}",) for i in range(50)], "gram string"
    )
    monkeypatch.setattr(bl, "BLOOM_GRAMS_MAX", 10)
    with pytest.raises(ValueError, match="shard the eval set"):
        bl.bloom_build(grams, spark)
