"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

HEADLINE = [
    "q1_pricing_summary",      # scan-heavy aggregation
    "j1_evidence_join",        # 4-way join
    "j5_cross_ontology_affinity",  # self-join aggregation
    "v1_vector_search",        # vector scan + top-k
    "g1_bfs_out_depth3",       # iterative traversal
    "a2a3_confidence_score",   # per-node signal aggregation
    "a4_grounding",            # broadcast-join weighted aggregation
    "d_minhash_lsh",           # shuffle-heavy near-dup pipeline
    "ann_ivf_topk",            # pruned similarity search
    "st_session_window",       # stateful session windowing
    "g3_k_shortest_paths",     # beam-capped path enumeration
    "x1_asof_join",            # union + carry-forward as-of join
    "d_simhash",               # bitwise near-dup clustering
    "v2_chunk_search",         # chunk-scan + vector score + stale flag
    "x2_skew_naive_join",      # hot-key shuffle join, unsalted baseline
    "x2_skew_salted_join",     # same join, salted 8x — must beat naive
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from knowledge_graph_system_spark.registry import load_all
    from knowledge_graph_system_spark.session import get_spark

    specs = load_all()
    spark = get_spark("kg-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in specs]

    def run(name: str) -> float:
        t0 = time.perf_counter()
        # noop sink: full distributed computation, no py4j driver transfer
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm pass: JIT, parquet footers, and the Ctx graph-view caches —
    # steady-state throughput is what a resident engine delivers
    for name in names:
        run(name)

    # best-of-3: the host shows multi-second background-load jitter;
    # min-of-N measures the engine, not the neighbors
    timings = {name: round(min(run(name) for _ in range(3)), 3) for name in names}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "kg-spark headline queries wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
