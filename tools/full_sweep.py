"""Full-registry differential sweep: every __spark_entry__ queries()
entry vs its DuckDB oracle at an arbitrary scale factor.

The strongest correctness gate this repo has (stronger than the
driver's 50-slot rotation window): it drove all 393 entries at sf0.1
for the first time at the r13 close and immediately caught a real
wrong answer sf0.01 could not produce (the ROUND decimal-tie split,
fixed in 0128581 — see SCALE.md "r13 FULL-registry sf0.1 sweep").

Usage:
    python tools/full_sweep.py [sf_dir] [--prefix esql_]

Defaults to /root/testdata/sf0.1. Notes (learned the hard way):
- driver memory is set to 36g here: at Spark's default the long
  session dies of GCLocker pressure ~200 Arrow-heavy entries in.
- budget ~25-55 min for the full registry at sf0.1 on a quiet box
  (the alphabetical front is the heavy ann_* kernels); nohup + poll.
- an sf0.001 pass is cheap (~8 min) and worth running when touching
  rounding/tie code: tiny groups produce the exact small-n quotients
  where cross-engine ties live.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    prefix = ""
    for a in sys.argv[1:]:
        if a.startswith("--prefix"):
            prefix = a.split("=", 1)[1] if "=" in a else ""
    if "--prefix" in sys.argv[1:]:
        prefix = sys.argv[sys.argv.index("--prefix") + 1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "36g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod
    from golang_db_query_engine_elasticsearch_indexer_spark.oracle import (
        compare,
        duckdb_connection,
    )

    con = duckdb_connection(sf_dir)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = [n for n in sorted(queries) if n.startswith(prefix)]
    t0 = time.time()
    fails = 0
    for done, name in enumerate(names, 1):
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                ok, diag = compare(df, con, oracles[name])
                if not ok:
                    fails += 1
                    print("MISMATCH", name, str(diag)[:400], flush=True)
            else:
                df.count()
        except Exception as exc:  # noqa: BLE001 — a sweep reports, not raises
            fails += 1
            print("ERROR", name, repr(exc)[:300], flush=True)
        if done % 50 == 0:
            print(
                f"... {done}/{len(names)} done, {fails} failures, "
                f"{time.time() - t0:.0f} s",
                flush=True,
            )
    print(
        f"SWEEP DONE {sf_dir}: {len(names)} entries, {fails} failures, "
        f"{time.time() - t0:.0f} s",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
