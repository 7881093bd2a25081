"""Capture .explain('formatted') for the bench headline queries.

Usage: python tools/capture_plans.py <out_dir> [suffix] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each headline query (default
suffix 'before'; default query set = bench.HEADLINE). Used by the r17
optimization round to commit before/after plan evidence.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r17"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or bench.HEADLINE
    os.makedirs(out_dir, exist_ok=True)

    from knowledge_graph_system_spark.registry import load_all
    from knowledge_graph_system_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark("kg-spark-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    fns = {n: specs[n].fn for n in names if n in specs}
    if "ann_ivf_topk" in names and "ann_ivf_topk" not in fns:
        from knowledge_graph_system_spark.operators.ann import ann_ivf_topk

        fns["ann_ivf_topk"] = ann_ivf_topk

    for name in names:
        if name not in fns:
            print(f"skip {name}: not found")
            continue
        df = fns[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
