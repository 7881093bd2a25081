"""Time individual suite members (captured fns) with the noop sink.

Usage: python tools/profile_members.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/members_profile.json"

    from knowledge_graph_system_spark.registry import load_all

    load_all()  # registers members in order BEFORE suites capture/pop them

    from knowledge_graph_system_spark.operators import suites
    from knowledge_graph_system_spark.session import get_spark

    spark = get_spark("kg-spark-member-profile")
    spark.sparkContext.setLogLevel("ERROR")

    groups = {
        "so": suites._SO_CAPTURED,
        "p7": suites._P7_CAPTURED,
        "st": suites._ST_CAPTURED,
    }

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out: dict[str, float] = {}
    for gname, captured in groups.items():
        for probe, fn, _oracle, _m in captured:
            spark.sparkContext.setJobDescription(f"profile:{probe}")
            try:
                run(fn)  # warm
                out[probe] = round(min(run(fn), run(fn)), 3)
            except Exception as e:  # noqa: BLE001
                out[probe] = -1.0
                print(f"ERROR {probe}: {e}", file=sys.stderr)
            print(f"{probe}: {out[probe]}", flush=True)

    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "total": round(sum(out.values()), 3),
                   "queries": ranked}, f, indent=1)
    print(json.dumps({"total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
