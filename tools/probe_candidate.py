"""Pre-registration probe for UNREGISTERED candidates — the part of
the measurement discipline bench_subset.py cannot cover (it resolves
names through the registry, which candidates are deliberately not in).

For each `module:function` given, runs the candidate at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) with warm pass + best-of-3 through the
noop sink, and — when --oracle names a `module:function` returning SQL
— compares against DuckDB at sf0.01 under a BARE SparkSession (the
driver-fidelity mode; the r11 HUGEINT lesson is that a factory-session
fetchall() check is weaker evidence than it sounds) and bind-lints the
oracle's output types for HUGEINT.

Usage:
    python tools/probe_candidate.py \\
        knowledge_graph_system_spark.operators.pq:ann_pq_topk \\
        --oracle knowledge_graph_system_spark.operators.pq:ann_pq_topk_oracle
"""

from __future__ import annotations

import argparse
import importlib
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _resolve(spec: str):
    # registrations first: candidate modules that capture registered
    # members (operators/suites.py) need the registry populated before
    # their top-level runs
    from knowledge_graph_system_spark import registry

    registry.load_all()
    mod, fn = spec.split(":")
    return getattr(importlib.import_module(mod), fn)


# The quality-heuristic teacher exists in three places by adjudicated
# deferral (textstats.t_quality_score, classifier._Y_EXPR,
# dsir._TARGET_EXPR — consolidation waits for a window where the
# graded textstats rows re-validate). Any candidate whose module
# touches one of these surfaces must prove the copies still agree.
_TEACHER_SURFACES = ("_Y_EXPR", "_TARGET_EXPR", "t_quality_score", "quality_score")


def _touches_teacher(spec: str) -> bool:
    mod = importlib.import_module(spec.split(":")[0])
    src_file = getattr(mod, "__file__", None)
    if not src_file:
        return False
    with open(src_file) as f:
        src = f.read()
    return any(s in src for s in _TEACHER_SURFACES)


def _teacher_drift_check(spark) -> None:
    """VERDICT r14 next #7: the drift trip-wire (tests/test_dsir.py::
    test_dsir_target_matches_graded_teacher) asserted IN the probe for
    any candidate touching the quality formula, so the deferred
    teacher consolidation can't rot silently between test runs."""
    from pyspark.sql import functions as F

    from knowledge_graph_system_spark.operators.classifier import _X_EXPR, _Y_EXPR
    from knowledge_graph_system_spark.operators.dsir import _TARGET_EXPR
    from knowledge_graph_system_spark.registry import Ctx

    docs = Ctx.get(spark, "/root/testdata/sf0.001").tables["documents"]
    both = (
        docs.withColumn("_ws", F.split("text", " "))
        .withColumn("x", F.expr(_X_EXPR))
        .select(
            F.expr(_TARGET_EXPR).alias("dsir_t"),
            F.expr(_Y_EXPR).alias("teacher_y"),
        )
    )
    n_drift = both.filter(F.col("dsir_t") != F.col("teacher_y")).count()
    n_pos = both.filter(F.col("dsir_t")).count()
    if n_drift or not n_pos:
        print(
            f"  TEACHER DRIFT: dsir target vs classifier teacher disagree on"
            f" {n_drift} docs ({n_pos} positives) — the triplicated quality"
            " formula has diverged; fix before registering"
        )
        sys.exit(1)
    print("  teacher-drift trip-wire: OK (dsir target == classifier teacher)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("candidates", nargs="+", help="module:function specs")
    ap.add_argument("--oracle", action="append", default=[],
                    help="module:function returning the candidate's SQL. "
                         "Paired to candidates BY POSITION (1st --oracle "
                         "with 1st candidate, ...), so give either zero "
                         "oracles or exactly one per candidate — a partial "
                         "list is rejected rather than silently matching "
                         "the wrong pair (ADVICE r12)")
    ap.add_argument("--legs", type=int, default=4, help="1 warm + N-1 timed")
    ap.add_argument(
        "--factory",
        action="store_true",
        help="use the repo's session factory (bigger driver memory) — "
        "needed for /tmp/kg_sf1 decade legs, where the default BARE "
        "1 GiB-driver session OOMs on AQE broadcast builds; keep the "
        "default bare session for sf0.01 oracle-fidelity checks",
    )
    args = ap.parse_args()
    if args.oracle and len(args.oracle) != len(args.candidates):
        ap.error(
            f"--oracle is paired to candidates by position: give 0 or "
            f"{len(args.candidates)} oracles, got {len(args.oracle)}"
        )

    if args.factory:
        from knowledge_graph_system_spark.session import get_spark

        spark = get_spark("kg-spark-candidate-probe")
    else:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .appName("kg-spark-candidate-probe")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if any(_touches_teacher(spec) for spec in args.candidates):
        _teacher_drift_check(spark)

    for i, spec in enumerate(args.candidates):
        fn = _resolve(spec)
        ts = []
        for _ in range(args.legs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        timed = ts[1:] or ts
        print(
            f"{spec} @ {sf_dir}: best {min(timed):.3f}s "
            f"median {statistics.median(timed):.3f}s all {[round(t, 2) for t in ts]} "
            f"loadavg {tuple(round(x, 1) for x in os.getloadavg())}"
        )
        if i < len(args.oracle):
            import duckdb

            osql = _resolve(args.oracle[i])()
            con = duckdb.connect()
            gate = "/root/testdata/sf0.01"
            for t in _TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{gate}/{t}.parquet')"
                )
            rel = con.sql(osql)
            wide = {
                c: str(t)
                for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()
            }
            got = sorted(map(tuple, fn(spark, gate).collect()))
            want = sorted(map(tuple, con.execute(osql).fetchall()))
            con.close()
            status = "MATCH" if got == want else "MISMATCH"
            print(
                f"  oracle @ sf0.01 (bare session): {status} "
                f"({len(got)} rows); HUGEINT cols: {wide or 'none'}"
            )
            if got != want or wide:
                sys.exit(1)


if __name__ == "__main__":
    main()
