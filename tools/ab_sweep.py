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
  phase B2: every query re-executed on its PRE-BUILT DataFrame
            (bench.py's exec-tier discipline)     -> spark_total_steady

B2 runs AFTER A2 (not between B and A2): the first r12 attempt ran it
inside the A/B/A sandwich and the extra JVM residency + page-cache
churn inflated DuckDB's A2 by 40-60 % on identical SQL — the
denominator must see exactly the legacy A/B/A memory profile.

|A1 - A2| brackets the within-run environment noise on the
denominator; the published ratios use mean(A1, A2). One warm pass of
both engines runs first (untimed), so the totals are steady-state.

Phase B rebuilds each DataFrame from scratch, so Python plan
construction + Catalyst analysis are INCLUDED — comparable with every
round's published runs, but dominated at local scale by a ~0.5 s/key
fixed cost that says nothing about data throughput (the r11 A/B/A
diagnosis). Phase B2 re-executes the same DataFrame objects, so the
timed quantity is scan+shuffle+agg+Arrow transfer — the component
that grows with data size and the one a 100 TB projection should
extrapolate from (VERDICT r11 #3). Both ratios are published.

os.getloadavg() is recorded at every phase boundary and published as
the `load` column, and per-phase CPU STEAL percentage (hypervisor
time taken from this VM — /proc/stat field 8, pure external
contention, unlike loadavg which mixes in this process's own threads)
as the `steal_pct` column — so a breached run carries its own
evidence of whether the slowdown was exogenous (VERDICT r11 #3's
load-normalized protocol). The denominator spread is the third
witness: DuckDB re-running byte-identical SQL in the same process
wanders only when the box does.

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

    loads: dict[str, float] = {"start": round(os.getloadavg()[0], 2)}

    def _stat() -> tuple[int, int]:
        """(steal jiffies, total jiffies) from /proc/stat."""
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)

    steal_pct: dict[str, float] = {}
    _last_stat = _stat()

    def _phase_steal(name: str) -> None:
        nonlocal _last_stat
        now = _stat()
        dt = now[1] - _last_stat[1]
        steal_pct[name] = round(
            100.0 * (now[0] - _last_stat[0]) / dt, 2
        ) if dt else 0.0
        _last_stat = now

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

    def spark_steady_pass() -> float:
        # Per key: build the DataFrame, execute once untimed (plan
        # build + warm), time ONE re-execution of the same object,
        # release it. The timed quantity is execution + transfer only
        # (bench.py's exec discipline). Per-key release matters:
        # holding all ~334 built DataFrames simultaneously OOM'd the
        # 8g driver JVM at the 10x probe scale (r12 first attempt) —
        # steady measurement must not change the session's residency
        # profile. Runs after A2 so the A phases see the legacy
        # memory profile (see module docstring).
        total = 0.0
        for n in names:
            df = specs[n].fn(spark, SF_DIR)
            df.toPandas()
            t0 = time.perf_counter()
            df.toPandas()
            total += time.perf_counter() - t0
            del df
        return total

    a1 = duck_pass()
    loads["a1"] = round(os.getloadavg()[0], 2)
    _phase_steal("a1")
    print(f"A1 duck_total  {a1:8.2f}s  load {loads['a1']}"
          f"  steal {steal_pct['a1']}%", flush=True)
    b = spark_pass()
    loads["b"] = round(os.getloadavg()[0], 2)
    _phase_steal("b")
    print(f"B  spark_total {b:8.2f}s  load {loads['b']}"
          f"  steal {steal_pct['b']}%", flush=True)
    a2 = duck_pass()
    loads["a2"] = round(os.getloadavg()[0], 2)
    _phase_steal("a2")
    print(f"A2 duck_total  {a2:8.2f}s  load {loads['a2']}"
          f"  steal {steal_pct['a2']}%", flush=True)
    b2 = spark_steady_pass()
    loads["b2"] = round(os.getloadavg()[0], 2)
    _phase_steal("b2")
    print(f"B2 spark_steady {b2:7.2f}s  load {loads['b2']}"
          f"  steal {steal_pct['b2']}%", flush=True)

    duck_mean = (a1 + a2) / 2
    out = {
        "sf_dir": SF_DIR,
        "n_keys": len(names),
        "duck_total_a1": round(a1, 2),
        "duck_total_a2": round(a2, 2),
        "spark_total": round(b, 2),
        "spark_total_steady": round(b2, 2),
        "ratio_vs_mean": round(b / duck_mean, 2),
        "ratio_steady_vs_mean": round(b2 / duck_mean, 2),
        "denominator_spread_pct": round(abs(a1 - a2) / duck_mean * 100, 1),
        "load": loads,
        "steal_pct": steal_pct,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
