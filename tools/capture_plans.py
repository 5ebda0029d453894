"""Capture .explain('formatted') for bench HEADLINE queries into
plans/<tag>/<query>_<suffix>.txt (guide §1: record the plan shape before
and after each optimization so claims are checkable without running
Spark).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
  tag:    plans subdirectory, e.g. r13
  suffix: 'before' or 'after'
  query:  optional subset; default = every bench.HEADLINE entry

Imperative operators (those that run jobs inside fn and return a frozen
result, e.g. localCheckpoint-based kernels) still produce a plan — for
those the interesting plans are the INTERNAL stages, so the captured
file additionally notes when the top-level plan is a checkpoint scan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    import bench

    names = sys.argv[3:] or bench.HEADLINE

    from golang_db_query_engine_elasticsearch_indexer_spark.session import (
        build_session,
    )

    import __spark_entry__ as entry

    spark = build_session(app_name=f"capture_plans_{tag}_{suffix}")
    qs = entry.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in queries()")
            continue
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture failures loudly, don't die
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        note = ""
        if "ExistingRDD" in plan or "LocalTableScan" in plan or "Scan ExistingRDD" in plan:
            note = (
                "NOTE: top-level plan scans a materialized/checkpointed result —\n"
                "the operator runs its heavy stages imperatively inside fn();\n"
                "see the operator docstring for the internal stage shapes.\n\n"
            )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(note + plan + "\n")
        print(f"captured {name}")
    spark.stop()


if __name__ == "__main__":
    main()
