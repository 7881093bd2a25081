"""Sampling / splitting / corpus-mixing: Spark vs inline DuckDB oracle
(bit-level row comparison — the same check tools/check_correctness.py
will run once these register in r7) plus determinism and distribution
properties."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.sampling import (
    corpus_mix,
    corpus_mix_sql,
    domain_quota,
    hash_split,
    hash_split_sql,
    stratified_sample,
    stratified_sample_sql,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    yield con
    con.close()


def _rows(df):
    return sorted(
        tuple(str(v) for v in row)
        for row in (r for r in df.select(*sorted(df.columns)).collect())
    )


def _duck_rows(con, sql):
    rel = con.sql(sql)
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rel.fetchall())


WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_hash_split_matches_oracle(docs, duck):
    got = _rows(hash_split(docs, "doc_id", WEIGHTS))
    want = _duck_rows(duck, hash_split_sql("documents", "doc_id", WEIGHTS))
    assert got == want


def test_hash_split_proportions_and_determinism(docs):
    out = hash_split(docs, "doc_id", WEIGHTS)
    n = docs.count()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= set(WEIGHTS)
    # 500 docs: proportions within a loose tolerance of the weights
    assert counts["train"] / n == pytest.approx(0.8, abs=0.08)
    # same assignment on a re-run (no RNG state)
    again = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", WEIGHTS).collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again


def test_hash_split_bad_weights(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_stratified_sample_matches_oracle(docs, duck):
    got = _rows(stratified_sample(docs, "lang", 10, "doc_id"))
    want = _duck_rows(
        duck, stratified_sample_sql("documents", "lang", 10, "doc_id")
    )
    assert got == want


def test_stratified_sample_exact_counts(docs):
    out = stratified_sample(docs, "lang", 10, "doc_id")
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n_full in full.items():
        assert sizes.get(lang, 0) == min(10, n_full)


def test_stratified_sample_stable_under_other_strata(docs):
    """Adding rows to OTHER strata must not change a stratum's sample
    (hash order is within-stratum)."""
    en = {r["doc_id"] for r in stratified_sample(docs, "lang", 5, "doc_id")
          .filter(F.col("lang") == "en").collect()}
    docs_fr_dropped = docs.filter(F.col("lang") != "fr")
    en2 = {r["doc_id"] for r in stratified_sample(docs_fr_dropped, "lang", 5, "doc_id")
           .filter(F.col("lang") == "en").collect()}
    assert en == en2


def test_domain_quota(docs):
    out = domain_quota(docs, "source", F.col("n_chars"), 3, "doc_id")
    sizes = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 3 for r in sizes)
    # kept rows are the top-3 by n_chars (ties by doc_id) per source
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    expect = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
    assert _rows(out) == _rows(expect)


MIX = {"en": 2.5, "fr": 0.4, "de": 0.0}


def test_corpus_mix_matches_oracle(docs, duck):
    got = _rows(corpus_mix(docs, "lang", MIX, "doc_id"))
    want = _duck_rows(duck, corpus_mix_sql("documents", "lang", MIX, "doc_id"))
    assert got == want


def test_corpus_mix_rates(docs):
    out = corpus_mix(docs, "lang", MIX, "doc_id")
    n_by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "de" not in n_by  # rate 0 drops the group
    # up-sampled: every row gets >= 2 copies, fraction gets a 3rd
    assert 2 * full["en"] <= n_by["en"] <= 3 * full["en"]
    assert n_by["en"] / full["en"] == pytest.approx(2.5, abs=0.3)
    # down-sampled
    assert n_by["fr"] / full["fr"] == pytest.approx(0.4, abs=0.15)
    # untouched groups default to rate 1.0
    assert n_by["es"] == full["es"]
    # copy ids are 0..n-1 per doc
    copies = out.filter(F.col("lang") == "en").groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("mix_copy").alias("mx"), F.min("mix_copy").alias("mn")
    ).collect()
    assert all(r["mn"] == 0 and r["mx"] == r["n"] - 1 for r in copies)


def test_hash_split_is_narrow(docs):
    """Split assignment must add NO exchange — it is a projection that
    fuses into the scan at any scale."""
    plan = (
        hash_split(docs, "doc_id", WEIGHTS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_corpus_mix_is_narrow(docs):
    plan = (
        corpus_mix(docs, "lang", MIX, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---- quantile filter ------------------------------------------------------


def test_quantile_filter_matches_oracle(spark, duck):
    from knowledge_graph_system_spark.operators.sampling import (
        quantile_filter,
        quantile_filter_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = _rows(quantile_filter(docs, "n_chars", 0.3, stratum="source"))
    want = _duck_rows(
        duck, quantile_filter_sql("documents", "n_chars", 0.3, stratum="source")
    )
    assert got == want and len(got) > 0


def test_quantile_filter_requires_stratum(spark):
    """stratum=None would be a single-partition global window — the
    operator refuses it and points at the threshold-based global
    variant instead."""
    import pytest as _pt

    from knowledge_graph_system_spark.operators.sampling import quantile_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with _pt.raises(ValueError, match="quantile_filter_global"):
        quantile_filter(docs, "n_chars", 0.25)


def test_quantile_filter_global_threshold_cut(spark):
    """The scalable global cut: kept fraction within the sketch
    tolerance, the kept set is exactly {score >= threshold} (no
    boundary-straddling row), and the plan has no Window at all."""
    from knowledge_graph_system_spark.operators.sampling import (
        quantile_filter_global,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total = docs.count()
    kept = quantile_filter_global(docs, "n_chars", 0.25, rel_err=0.001)
    n_kept = kept.count()
    assert abs(n_kept / total - 0.25) < 0.05  # ties + rel_err margin
    thr = kept.agg(F.min("n_chars")).collect()[0][0]
    assert docs.filter(F.col("n_chars") >= thr).count() == n_kept
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Exchange" not in plan


def test_quantile_filter_per_stratum_fraction(spark):
    from knowledge_graph_system_spark.operators.sampling import quantile_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept = quantile_filter(docs, "n_chars", 0.5, stratum="source")
    totals = {r["source"]: r["n"] for r in docs.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    kept_by = {r["source"]: r["n"] for r in kept.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    for src, n in totals.items():
        # cume_dist keeps ceil-ish(frac * n) with tie inflation only
        assert 1 <= kept_by[src] <= n
        assert abs(kept_by[src] - 0.5 * n) <= max(2, 0.1 * n)
    # every kept row's score >= every dropped row's score within stratum
    from pyspark.sql import Window
    mins = kept.groupBy("source").agg(F.min("n_chars").alias("kept_min"))
    dropped = docs.join(kept.select("doc_id"), "doc_id", "left_anti")
    bad = (
        dropped.join(mins, "source")
        .filter(F.col("n_chars") > F.col("kept_min"))
        .count()
    )
    assert bad == 0


def test_quantile_filter_rejects_bad_frac(spark):
    from knowledge_graph_system_spark.operators.sampling import quantile_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import pytest as _pt
    with _pt.raises(ValueError):
        quantile_filter(docs, "n_chars", 0.0)


def test_r9_candidate_quantile_global(spark):
    """Driver-style compare for the prepared smp_quantile_global row at
    BOTH gate scale factors: with rel_err=0.0 Spark's Greenwald-Khanna
    quantile is exact and must return the same dataset element as
    DuckDB's quantile_disc, making the whole kept set hash-identical."""
    import duckdb

    from knowledge_graph_system_spark.operators.sampling import (
        smp_quantile_global,
        smp_quantile_global_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, smp_quantile_global(spark, sf).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(map(tuple, con.execute(smp_quantile_global_oracle()).fetchall()))
        con.close()
        assert len(got) > 0 and got == want


def test_weighted_sample_matches_duckdb_both_sfs(spark):
    """ES weighted sampling: Spark and the SQL twin must pick the SAME
    rows at both gate scale factors (4 dp priority rounding + key
    tie-break keeps the one transcendental engine-portable), globally
    and per-group."""
    from knowledge_graph_system_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_sql,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        d = spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id", "source", "n_chars"
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT doc_id, source, n_chars FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        got = _rows(weighted_sample(d, "n_chars", 50, "doc_id"))
        want = _duck_rows(
            con, weighted_sample_sql("documents", "n_chars", 50, "doc_id")
        )
        assert got == want and len(got) == 50
        got_g = _rows(weighted_sample(d, "n_chars", 5, "doc_id", group="source"))
        want_g = _duck_rows(
            con,
            weighted_sample_sql("documents", "n_chars", 5, "doc_id", group="source"),
        )
        assert got_g == want_g and len(got_g) > 0
        con.close()


def test_weighted_sample_semantics(spark, docs):
    """Without replacement (unique keys), exact k, weight-biased (the
    sample's mean weight exceeds the corpus mean), deterministic, and
    non-positive weights never selected."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.sampling import weighted_sample

    d = docs.select("doc_id", "n_chars")
    s = weighted_sample(d, "n_chars", 100, "doc_id")
    rows = s.collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == 100 and len(set(ids)) == 100
    corpus_mean = d.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean
    again = {r["doc_id"] for r in weighted_sample(d, "n_chars", 100, "doc_id").collect()}
    assert again == set(ids)
    with_dead = d.withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, F.lit(0.0)).otherwise(F.col("n_chars"))
    )
    alive = weighted_sample(with_dead, "w", 100, "doc_id").collect()
    assert all(r["doc_id"] % 2 == 1 for r in alive)


def test_temperature_mix_flattens_toward_uniform(spark, docs, duck):
    """alpha=0.5 must pull group shares toward uniform while keeping
    total size ~unchanged, and the realized mix must match corpus_mix's
    SQL oracle under the computed rates (alpha=1 is a no-op mix:
    every rate 1.0)."""
    from knowledge_graph_system_spark.operators.sampling import (
        corpus_mix_sql,
        temperature_mix,
        temperature_rates,
    )

    d = docs.select("doc_id", "source", "n_chars")
    counts = {r[0]: r[1] for r in d.groupBy("source").count().collect()}
    total = sum(counts.values())

    rates1 = temperature_rates(list(counts.items()), alpha=1.0)
    assert all(abs(v - 1.0) < 1e-6 for v in rates1.values())

    mixed = temperature_mix(d, "source", "doc_id", alpha=0.5)
    out_counts = {r[0]: r[1] for r in mixed.groupBy("source").count().collect()}
    out_total = sum(out_counts.values())
    assert abs(out_total - total) / total < 0.05
    # flattening: every group's share moves toward (or onto) uniform
    n_groups = len(counts)
    for g, n in counts.items():
        before = n / total
        after = out_counts.get(g, 0) / out_total
        uni = 1.0 / n_groups
        assert abs(after - uni) <= abs(before - uni) + 1e-3
    # exact realized-mix parity with the corpus_mix SQL oracle
    rates = temperature_rates(list(counts.items()), alpha=0.5)
    got = _rows(mixed)
    want = _duck_rows(
        duck,
        corpus_mix_sql(
            "(SELECT doc_id, source, n_chars FROM documents) t",
            "source",
            rates,
            "doc_id",
            salt="tmix",
        ),
    )
    assert got == want


def test_weighted_sample_global_plan_is_take_ordered(spark, docs):
    """The global path must NOT funnel the corpus through a
    single-partition window (the r6 quantile pathology) — it plans as
    TakeOrderedAndProject; the grouped path keys its window on the
    group column."""
    from knowledge_graph_system_spark.operators.sampling import weighted_sample

    d = docs.select("doc_id", "n_chars", "source")
    g = weighted_sample(d, "n_chars", 50, "doc_id")
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    per = weighted_sample(d, "n_chars", 5, "doc_id", group="source")
    pplan = per._jdf.queryExecution().executedPlan().toString()
    assert "Window" in pplan
    assert "hashpartitioning(source" in pplan  # keyed, not single-partition


def test_r10_candidate_weighted(spark):
    """Driver-style compare for the prepared smp_weighted row at BOTH
    gate scale factors: the global (TakeOrderedAndProject) and
    per-group (single window) ES forms, each hash-exact against
    weighted_sample_sql — 4 dp priority rounding keeps ln portable."""
    import duckdb

    from knowledge_graph_system_spark.operators.sampling import (
        smp_weighted,
        smp_weighted_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, smp_weighted(spark, sf).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(map(tuple, con.execute(smp_weighted_oracle()).fetchall()))
        con.close()
        assert len(got) > 0 and got == want


def test_r10_candidate_temperature_mix(spark):
    """Driver-style compare for the prepared smp_temperature_mix row
    at BOTH gate scale factors. The oracle derives the rates IN SQL —
    counts → pow(n/total, 0.5) → z as an ORDERED list_sum matching
    Python's sorted-group accumulation → round 6 dp — so the oracle
    string is static while the rates stay data-dependent, and the
    realized mix inherits corpus_mix's exact hash-threshold filter."""
    import duckdb

    from knowledge_graph_system_spark.operators.sampling import (
        smp_temperature_mix,
        smp_temperature_mix_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, smp_temperature_mix(spark, sf).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(
            map(tuple, con.execute(smp_temperature_mix_oracle()).fetchall())
        )
        con.close()
        assert len(got) > 0 and got == want


def test_r11_candidate_epoch_order(spark):
    """Driver-style compare for the prepared smp_epoch_order row at
    BOTH gate scale factors, plus the trainer-facing semantics: dense
    0-based positions within every shard, a full permutation (every
    input row appears exactly once), and a DIFFERENT permutation for a
    different epoch (the epoch is in the hash preimage)."""
    import duckdb

    from knowledge_graph_system_spark.operators.sampling import (
        epoch_order,
        smp_epoch_order,
        smp_epoch_order_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = smp_epoch_order(spark, sf).collect()
        got = sorted(map(tuple, rows))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
        want = sorted(map(tuple, con.execute(smp_epoch_order_oracle()).fetchall()))
        con.close()
        assert len(got) == n_docs and got == want
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) <= set(range(8))
        for poss in by_shard.values():
            assert sorted(poss) == list(range(len(poss)))

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source"
    )
    e1 = {r["doc_id"]: (r["shard"], r["pos"]) for r in epoch_order(docs, "doc_id", 1, 8).collect()}
    e2 = {r["doc_id"]: (r["shard"], r["pos"]) for r in epoch_order(docs, "doc_id", 2, 8).collect()}
    assert set(e1) == set(e2)
    assert any(e1[k] != e2[k] for k in e1)


# ---------------------------------------------------------------------------
# r13 candidate: leakage-safe splitting (near-dup groups never straddle)
# ---------------------------------------------------------------------------


def test_r13_candidate_smp_leakage_split(spark):
    """Driver-style compare at BOTH gate scale factors against the
    composed oracle (byte-shared recursive-CC group CTEs + the
    hash_split CASE over the coalesced key)."""
    from knowledge_graph_system_spark.operators.sampling import (
        smp_leakage_split,
        smp_leakage_split_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, smp_leakage_split(spark, sf).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(
            map(tuple, con.execute(smp_leakage_split_oracle()).fetchall())
        )
        con.close()
        assert len(got) == 3 and got == want
        assert sum(r[2] for r in got) > 0  # grouped docs really exist


def test_leakage_split_no_group_straddles(spark):
    """THE invariant: zero near-dup groups with members in more than
    one split — and the contrast leg proves a plain per-doc hash split
    DOES straddle on this corpus (the leak this operator exists to
    close)."""
    from knowledge_graph_system_spark.operators.components import d_dup_groups
    from knowledge_graph_system_spark.operators.sampling import (
        _LSPLIT_WEIGHTS,
        hash_split,
        leakage_safe_split,
    )
    from knowledge_graph_system_spark.registry import Ctx

    sf = "/root/testdata/sf0.001"
    ctx = Ctx.get(spark, sf)
    docs = ctx.tables["documents"]
    groups = d_dup_groups(spark, sf).localCheckpoint(eager=True)

    safe = leakage_safe_split(docs, groups, _LSPLIT_WEIGHTS)
    straddle = (
        safe.join(groups.select("doc_id", "group_id"), "doc_id")
        .groupBy("group_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0

    naive = hash_split(docs, "doc_id", _LSPLIT_WEIGHTS, salt="lsplit")
    naive_straddle = (
        naive.join(groups.select("doc_id", "group_id"), "doc_id")
        .groupBy("group_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert naive_straddle > 0  # the per-doc split really leaks here

    # rates still track the weights (group keying must not skew them)
    n = docs.count()
    rates = {r["split"]: r["n"] / n for r in
             safe.groupBy("split").agg(F.count("*").alias("n")).collect()}
    for name, w in _LSPLIT_WEIGHTS.items():
        assert abs(rates[name] - w) < 0.05, (name, rates)


# ---------------------------------------------------------------------------
# Fixed-grid histogram quantiles (prepared r17 candidate)
# ---------------------------------------------------------------------------


def _oracle(sql: str, sf: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_r17_candidate_smp_grid_quantiles(spark):
    """Driver-style compare at BOTH gate scale factors: per-source
    p50/p90/p99 on the 256-bucket grid, hash-exact against the
    all-BIGINT SQL twin."""
    from knowledge_graph_system_spark.operators.sampling import (
        smp_grid_quantiles,
        smp_grid_quantiles_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = sorted(map(tuple, smp_grid_quantiles(spark, sf).collect()))
        want = sorted(map(tuple, _oracle(smp_grid_quantiles_oracle(), sf)))
        assert len(got) > 0 and got == want


def test_grid_quantiles_semantics_and_clamp(spark):
    """Hand-checkable: 10 values 0..90 on a [0, 100) 10-bucket grid —
    p50 position ceil(.5*10)=5 -> 5th value (40) sits in bucket 4,
    edge 40; p90 -> 80; out-of-range values clamp into the edge
    buckets instead of corrupting neighbors."""
    from knowledge_graph_system_spark.operators.sampling import grid_quantiles

    df = spark.createDataFrame([(i * 10,) for i in range(10)], "v long")
    got = {
        r["q"]: r["gq"]
        for r in grid_quantiles(
            df, "v", [("p50", 0.5), ("p90", 0.9)], lo=0, hi=100, bins=10
        ).collect()
    }
    assert got == {"p50": 40, "p90": 80}

    wild = spark.createDataFrame([(-50,), (20,), (20,), (999,)], "v long")
    got = {
        r["q"]: r["gq"]
        for r in grid_quantiles(
            wild, "v", [("p25", 0.25), ("p100", 1.0)], lo=0, hi=100, bins=10
        ).collect()
    }
    # -50 clamps into bucket 0 (edge 0); 999 clamps into bucket 9
    assert got == {"p25": 0, "p100": 90}


def test_grid_quantiles_partition_invariance(spark):
    """The histogram counters are plain sums, so ANY partitioning of
    the input yields identical output — the mergeability claim,
    tested directly."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.sampling import grid_quantiles

    rows = [(i, f"s{i % 3}") for i in range(301)]
    df = spark.createDataFrame(rows, "v long, src string")
    qs = [("p50", 0.5), ("p99", 0.99)]

    def run(frame):
        return sorted(
            map(
                tuple,
                grid_quantiles(
                    frame, "v", qs, lo=0, hi=400, bins=40, group="src"
                ).collect(),
            )
        )

    assert run(df) == run(df.repartition(13)) and len(run(df)) == 6


def test_grid_quantiles_resolution_bound(spark):
    """Exactness at grid resolution: the answer never exceeds the true
    quantile_disc value and sits within one bucket width below it."""
    import duckdb

    from knowledge_graph_system_spark.operators.sampling import grid_quantiles

    rows = [((i * 37) % 997,) for i in range(500)]
    df = spark.createDataFrame(rows, "v long")
    width = 1000 // 100
    got = {
        r["q"]: r["gq"]
        for r in grid_quantiles(
            df, "v", [("p50", 0.5), ("p90", 0.9)], lo=0, hi=1000, bins=100
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for (v,) in rows])
    for label, frac in (("p50", 0.5), ("p90", 0.9)):
        (true_q,) = con.execute(
            f"SELECT quantile_disc(v, {frac}) FROM t"
        ).fetchone()
        assert got[label] <= true_q < got[label] + width
    con.close()


def test_grid_quantiles_rejects_bad_grid(spark):
    import pytest

    from knowledge_graph_system_spark.operators.sampling import grid_quantiles

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="hi > lo"):
        grid_quantiles(df, "v", [("p50", 0.5)], lo=10, hi=10, bins=4)
