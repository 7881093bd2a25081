"""Focused re-bench of a named query subset — the attribution tool for
round-over-round regressions (VERDICT r5 task #1).

Same methodology as bench.py (warm pass, best-of-3, noop sink, CPU
probe) but only for the queries named on the command line, so a single
suspect can be timed on an idle host in isolation.

Usage: python tools/bench_subset.py d_minhash_lsh ann_ivf_topk ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from knowledge_graph_system_spark.registry import load_all
    from knowledge_graph_system_spark.session import get_spark

    specs = load_all()
    spark = get_spark("kg-spark-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def cpu_probe() -> float:
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        return time.perf_counter() - t0

    for name in names:
        run(name)

    probes = [cpu_probe()]
    stats: dict[str, dict[str, float]] = {}
    for name in names:
        reps = [run(name) for _ in range(3)]
        probes.append(cpu_probe())
        stats[name] = {
            "best": round(min(reps), 3),
            "median": round(statistics.median(reps), 3),
            "spread": round(max(reps) / max(min(reps), 1e-9), 2),
        }

    load1, load5, _ = os.getloadavg()
    print(
        json.dumps(
            {
                "queries": stats,
                "host": {
                    "cpu_probe_best_s": round(min(probes), 3),
                    "cpu_probe_worst_s": round(max(probes), 3),
                    "loadavg_1m": round(load1, 2),
                    "loadavg_5m": round(load5, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
