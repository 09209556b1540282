"""Side-effect key trend measurement (VERDICT r8 #6).

The ~40 sink_/source_/stream_ keys are excluded from the A/B/A engine
ratio BY DESIGN (their wall measures a real side effect — file writes,
stream micro-batches — against a recompute-only DuckDB oracle), which
also means nothing catches a regression in the side-effect cost
itself: BENCH.md's per-key rows for them ride the resume cache across
rounds. This script re-measures exactly that tier in one session and
prints a markdown block for BENCH.md's trend table: wall (best-of-3,
full fn+toPandas) and exec (same DataFrame re-executed) per key.

Usage: python tools/sideeffect_trend.py [> block.md]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_AQE", "false")  # match the perf harness

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3


def main() -> None:
    from jsmr_spark.registry import canonical_specs
    from jsmr_spark.session import get_spark

    spark = get_spark("jsmr_sideeffect_trend")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {
        n: s
        for n, s in canonical_specs().items()
        if n.startswith(("sink_", "source_", "stream_"))
    }
    names = sorted(specs)
    print(f"{len(names)} side-effect keys at {SF_DIR}", file=sys.stderr)

    rows = []
    for n in names:
        fn = specs[n].fn
        fn(spark, SF_DIR).toPandas()  # warm (codegen, dir staging)
        wall = min(
            _timed(lambda: fn(spark, SF_DIR).toPandas()) for _ in range(RUNS)
        )
        df = fn(spark, SF_DIR)
        df.toPandas()
        ex = min(_timed(df.toPandas) for _ in range(RUNS))
        rows.append((n, wall, ex))
        print(f"  {n}: {wall:.3f}s (exec {ex:.3f}s)", file=sys.stderr)

    print("| key | spark_s | exec_s |")
    print("|---|---|---|")
    for n, wall, ex in rows:
        print(f"| {n} | {wall:.3f} | {ex:.3f} |")
    print()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "n_keys": len(rows),
                "total_wall_s": round(sum(r[1] for r in rows), 2),
                "total_exec_s": round(sum(r[2] for r in rows), 2),
            }
        )
    )


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
