"""Decompose per-key wall time: DataFrame build vs first execution vs
steady re-execution.

For each key: t_build = spec.fn(spark, sf_dir) (py4j Column
construction + any eager work inside the builder, e.g. literal-probe
head() or iterative localCheckpoint rounds), t_first = first
.toPandas() on that object (analysis + optimization + physical
planning + codegen + execution + Arrow transfer), t_exec = best-of-3
repeat .toPandas() (physical re-execution only — QueryExecution is
cached on the DataFrame). Wall in the BENCH tables ~ t_build +
t_first.

Usage: python tools/profile_breakdown.py [key ...]
       python tools/profile_breakdown.py --top N   (top-N wall keys from BENCH.md order given on stdin)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_AQE", "false")


def main() -> None:
    keys = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from jsmr_spark.registry import all_specs
    from jsmr_spark.session import get_spark

    spark = get_spark("jsmr_profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    rows = []
    for name in keys:
        spec = specs[name]
        # warm: one full build+exec so codegen/scan caches are hot
        spec.fn(spark, sf_dir).toPandas()
        b_build = b_first = b_exec = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.toPandas()
            t2 = time.perf_counter()
            b_build = min(b_build, t1 - t0)
            b_first = min(b_first, t2 - t1)
        df = spec.fn(spark, sf_dir)
        df.toPandas()
        for _ in range(3):
            t0 = time.perf_counter()
            df.toPandas()
            b_exec = min(b_exec, time.perf_counter() - t0)
        rows.append(
            {
                "key": name,
                "build_s": round(b_build, 4),
                "first_exec_s": round(b_first, 4),
                "steady_exec_s": round(b_exec, 4),
                "plan_overhead_s": round(b_first - b_exec, 4),
            }
        )
        print(
            f"{name}: build {b_build:.3f}s  first {b_first:.3f}s  "
            f"steady {b_exec:.3f}s  (plan overhead {b_first - b_exec:.3f}s)",
            file=sys.stderr,
        )
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
