"""Time EVERY registered query at $SPARK_GRAFT_SF_DIR with the noop sink.

One warm pass + best-of-2, printed as a sorted JSON line per query plus a
total. Used by the r17 optimization round to rank the 100-row registry by
cost and build the operator checklist (guide §1).

Usage: python tools/sweep_all.py [sf_dir] [out_json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_all.json"

    from knowledge_graph_system_spark.registry import load_all
    from knowledge_graph_system_spark.session import get_spark

    specs = load_all()
    only = set(sys.argv[3:])
    if only:
        specs = {k: v for k, v in specs.items() if k in only}
    spark = get_spark("kg-spark-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out: dict[str, float] = {}
    for name, spec in specs.items():
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            run(spec.fn)  # warm
            out[name] = round(min(run(spec.fn), run(spec.fn)), 3)
        except Exception as e:  # noqa: BLE001
            out[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
        print(f"{name}: {out[name]}", flush=True)

    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "total": round(sum(out.values()), 3),
                   "queries": ranked}, f, indent=1)
    print(json.dumps({"total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
