"""A/B a Spark conf set over a named query subset (guide §1: measure
first; §9: config last). Same methodology as bench_subset (warm pass +
best-of-3, noop sink) but the session is built with extra conf pairs.

Usage:
    python tools/conf_experiment.py out.json q1 q2 ... -- k=v k=v ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0]
    if "--" in args:
        i = args.index("--")
        names, confs = args[1:i], dict(a.split("=", 1) for a in args[i + 1:])
    else:
        names, confs = args[1:], {}

    from knowledge_graph_system_spark.registry import load_all
    from knowledge_graph_system_spark.session import get_spark

    specs = load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kg-spark-conf-exp", extra_conf=confs)
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        run(name)  # warm
    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"exp:{name}")
        out[name] = round(min(run(name) for _ in range(3)), 3)
        print(f"{name}: {out[name]}", flush=True)

    payload = {"confs": confs, "total": round(sum(out.values()), 3),
               "queries": out, "loadavg": os.getloadavg()[0]}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"total": payload["total"], "loadavg": payload["loadavg"]}))


if __name__ == "__main__":
    main()
