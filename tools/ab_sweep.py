"""Same-session interleaved DuckDB/Spark A/B/A sweep (VERDICT r6 #3).

BENCH.md's full-sweep totals accumulate across sessions through the
resume cache, so the Spark and DuckDB columns for different keys can
come from different machine states — the r4->r6 "DuckDB total halved"
swing was exactly that. This script pins ONE run: a single process,
one SparkSession and one DuckDB connection, engine-comparable keys
only (side-effect sink_/source_/stream_ rows excluded — their ratio
prices the side effect, not the engine), measured A/B/A:

  phase A1: every oracle once through DuckDB      -> duck_total_1
  phase B : every query once through Spark (wall) -> spark_total
  phase A2: every oracle once through DuckDB      -> duck_total_2

|A1 - A2| brackets the within-run environment noise on the
denominator; the published ratio uses mean(A1, A2). One warm pass of
both engines runs first (untimed), so the totals are steady-state.

Usage: python tools/ab_sweep.py  -> prints one JSON line and a
markdown block to splice into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

# Perf harness: AQE off at local bench scale (see bench.py for the
# measured rationale); override with SPARK_GRAFT_AQE=true to compare.
os.environ.setdefault("SPARK_GRAFT_AQE", "false")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from jsmr_spark.io import TABLES
    from jsmr_spark.registry import canonical_specs
    from jsmr_spark.session import get_spark

    spark = get_spark("jsmr_ab_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        # Spark-staged tables (the 10x probe dir) are DIRECTORIES of
        # part files; the fixture tables are single files.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    # AB_EXCLUDE: comma-separated keys to drop — used for the 10x run
    # to skip the BY-DESIGN-quadratic DuckDB oracles (exact all-pairs
    # baselines whose oracle cost is O(N^2); at 10x each would cost
    # DuckDB ~100x its sf0.1 seconds). Excluding them is CONSERVATIVE
    # for the published ratio: they are precisely the keys where Spark's
    # block-GEMM already beats DuckDB ~10x at sf0.1.
    #
    # The tokens `eval_tier` and `quadratic_oracle` expand to EXACTLY
    # the registry's corresponding flag sets (VERDICT r9 #3: the
    # exclusion list must equal the registry flags, nothing excluded by
    # prose alone). The 10x protocol is
    # AB_EXCLUDE=eval_tier,quadratic_oracle (quadratic_oracle keys have
    # a scalable SPARK plan but a by-design-quadratic DuckDB oracle —
    # timing that oracle at 10x prices the oracle, not the engine).
    # Ad-hoc extra keys can still be appended but each one shows up in
    # the printed exclusion line.
    exclude = set(filter(None, os.environ.get("AB_EXCLUDE", "").split(",")))
    if "eval_tier" in exclude:
        exclude.discard("eval_tier")
        exclude |= {n for n, s in canonical_specs().items() if s.eval_tier}
    if "quadratic_oracle" in exclude:
        exclude.discard("quadratic_oracle")
        exclude |= {
            n for n, s in canonical_specs().items() if s.quadratic_oracle
        }
    if exclude:
        print(f"excluded ({len(exclude)}): {','.join(sorted(exclude))}",
              flush=True)
    specs = {
        n: s
        for n, s in canonical_specs().items()
        if s.oracle is not None
        and not n.startswith(("sink_", "source_", "stream_"))
        and n not in exclude
    }
    names = sorted(specs)
    print(f"{len(names)} engine-comparable keys at {SF_DIR}", flush=True)

    # untimed warm pass. AB_WARM=spark warms only the Spark side (JVM
    # + codegen caches need it; DuckDB's only warmup is the OS page
    # cache, which its A1 pass both builds and pays for — biasing A1
    # UP, i.e. against Spark's ratio: conservative).
    for n in names:
        if os.environ.get("AB_WARM", "both") != "spark":
            con.execute(specs[n].oracle).df()
        specs[n].fn(spark, SF_DIR).toPandas()
    print("warm pass done", flush=True)

    def duck_pass() -> float:
        t0 = time.perf_counter()
        for n in names:
            con.execute(specs[n].oracle).df()
        return time.perf_counter() - t0

    def spark_pass() -> float:
        t0 = time.perf_counter()
        for n in names:
            specs[n].fn(spark, SF_DIR).toPandas()
        return time.perf_counter() - t0

    a1 = duck_pass()
    print(f"A1 duck_total  {a1:8.2f}s", flush=True)
    b = spark_pass()
    print(f"B  spark_total {b:8.2f}s", flush=True)
    a2 = duck_pass()
    print(f"A2 duck_total  {a2:8.2f}s", flush=True)

    duck_mean = (a1 + a2) / 2
    out = {
        "sf_dir": SF_DIR,
        "n_keys": len(names),
        "duck_total_a1": round(a1, 2),
        "duck_total_a2": round(a2, 2),
        "spark_total": round(b, 2),
        "ratio_vs_mean": round(b / duck_mean, 2),
        "denominator_spread_pct": round(abs(a1 - a2) / duck_mean * 100, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
