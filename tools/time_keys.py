"""Per-key wall-clock profile of the driver correctness sweep.

Simulates the driver's protocol: ONE vanilla SparkSession (none of our
configs), every ``queries()`` key executed at sf0.01 and collect()ed,
alphabetical order (the driver's order). Prints per-key seconds sorted
descending plus the running total, so we can see exactly where a driver
time budget would cut the sweep.

Usage: PYTHONPATH=/root/repo python tools/time_keys.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .appName("time-keys")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402

qs = e.queries()
times: dict[str, float] = {}
total = 0.0
for name in sorted(qs):
    t0 = time.monotonic()
    qs[name](spark, sf_dir).collect()
    dt = time.monotonic() - t0
    times[name] = dt
    total += dt
    print(f"{total:8.1f}  {dt:6.2f}  {name}", file=sys.stderr)

print("\n=== slowest first ===")
for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"{dt:6.2f}  {name}")
print(f"TOTAL {total:.1f}s over {len(times)} keys")
