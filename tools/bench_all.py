"""Full M9 measurement: every oracle-keyed query on Spark (warm) and
DuckDB at a given SF dir; writes BENCH.md (BASELINE.md protocol)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from jsmr_spark.io import TABLES
from jsmr_spark.registry import canonical_specs
from jsmr_spark.session import get_spark


def timed(fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def cache_from_md(cache_path: str) -> None:
    """Seed the resume cache from the committed BENCH.md rows, so a run
    after adding N new keys measures ONLY those keys instead of
    repeating the full ~45-minute sweep. Usage:
        python tools/bench_all.py --cache-from-md /tmp/cache.json
        JSMR_BENCH_CACHE=/tmp/cache.json python tools/bench_all.py
    """
    import re

    bench_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"
    )
    cache = {}
    for line in open(bench_md):
        # Only the per-key table at the top of the file is the cache
        # source: the appended sections (pinned A/B/A, side-effect tier
        # trend) contain OTHER tables whose first five cells can match
        # a per-key row shape — the round-11 rebuild caught the trend
        # rows (| key | r9_wall | r10_wall | r9_exec | r10_exec | x |)
        # silently overwriting ~30 sink_/stream_ keys with wrong
        # columns. Stop at the first appended section header.
        if line.startswith("## "):
            break
        # any per-key row: a bare name plus four numeric cells (the
        # numeric groups already exclude the header and **TOTAL** rows,
        # and a fixed prefix list would silently drop future families)
        m = re.match(
            r"\| (\S+) \| ([\d.]+) \| ([\d.]+) \| ([\d.]+) \| [\d.]+ \|",
            line,
        )
        if m:
            cache[m.group(1)] = [float(m.group(2)), float(m.group(3)), float(m.group(4))]
    with open(cache_path, "w") as f:
        json.dump(cache, f)
    print(f"seeded {len(cache)} keys from BENCH.md -> {cache_path}")


def main():
    spark = get_spark("jsmr_bench_all")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    specs = canonical_specs()
    # warm up JVM
    specs["q_agg_q1"].fn(spark, SF_DIR).collect()

    # Per-key cache so a wall-clock-limited harness can resume the
    # sweep across invocations (JSMR_BENCH_CACHE=/path.json). BENCH.md
    # is only written once every oracle key is present.
    cache_path = os.environ.get("JSMR_BENCH_CACHE")
    cache: dict[str, list[float]] = {}
    if cache_path and os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)

    todo = {n: s for n, s in specs.items() if s.oracle is not None}
    for name, spec in todo.items():
        if name in cache and len(cache[name]) == 3:
            continue
        duck_s = timed(lambda: con.execute(spec.oracle).df())
        spark_s = timed(lambda: spec.fn(spark, SF_DIR).toPandas())
        # Steady-state execution (VERDICT r3 #5): re-execute the SAME
        # DataFrame, so plan build/Catalyst/codegen are excluded — the
        # component that grows with data size. For eager side-effect keys
        # (sink_*/source_*/stream_*) the writes/micro-batches run at
        # DataFrame-BUILD time, so exec_s there only re-reads the few-row
        # result — wall_s stays the honest number for those rows (the
        # by-design asymmetry BENCH.md documents).
        df = spec.fn(spark, SF_DIR)
        df.toPandas()
        exec_s = timed(lambda: df.toPandas())
        cache[name] = [duck_s, spark_s, exec_s]
        print(
            f"{name:28s} duck={duck_s:7.3f}s spark={spark_s:7.3f}s "
            f"exec={exec_s:7.3f}s ratio={spark_s/duck_s:6.2f}",
            flush=True,
        )
        if cache_path:
            with open(cache_path, "w") as f:
                json.dump(cache, f)

    missing = sorted(n for n in todo if n not in cache or len(cache[n]) != 3)
    if missing:
        print(f"partial: {len(todo)-len(missing)}/{len(todo)} keys; rerun to continue ({len(missing)} left)", flush=True)
        return

    rows = [
        (name, d, s, e, (s / d if d > 0 else float("inf")))
        for name, (d, s, e) in cache.items()
        if name in todo
    ]
    rows.sort(key=lambda r: -r[4])
    # Preserve the hand-curated pinned-A/B/A section (tools/ab_sweep.py
    # results) across regenerations of the per-key table.
    bench_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"
    )
    ab_marker = "## Pinned same-session A/B/A"
    ab_tail = ""
    if os.path.exists(bench_path):
        old = open(bench_path).read()
        if ab_marker in old:
            ab_tail = old[old.index(ab_marker) :]
    with open(bench_path, "w") as f:
        f.write(f"# BENCH — measured at {SF_DIR} (best of 3, warm shared session, local[{os.cpu_count()}])\n\n")
        f.write("Protocol: BASELINE.md. Sorted by ratio (spark/duckdb), worst first.\n")
        f.write("(Protocol note: since round 3, timings are best-of-3 after a warm\n")
        f.write("pass; rounds 1-2 were best-of-2 including a cold first run, so\n")
        f.write("cross-round totals compare a slightly more favorable steady state\n")
        f.write("from r3 on.)\n\n")
        f.write("Reading the ratios: DuckDB executes in-process with ~1-10ms floor;\n")
        f.write("Spark local mode pays ~0.1-0.3s per query for task scheduling and\n")
        f.write("the py4j/Arrow boundary, so sub-second queries show large ratios\n")
        f.write("that are FIXED OVERHEAD, not throughput (see SCALE.md: 10x data ->\n")
        f.write("0.2-2.5x time for everything but the by-design-quadratic all-pairs\n")
        f.write("edge graph). Data-heavy queries (pairs/GEMM, top-k, clusters) run\n")
        f.write("at or beyond DuckDB parity.\n\n")
        f.write("exec_s re-executes the SAME DataFrame (plan build/Catalyst/codegen\n")
        f.write("excluded): the steady-state data work a 100 TB projection should\n")
        f.write("extrapolate from. Where exec_s << spark_s, the wall is local-mode\n")
        f.write("fixed overhead that amortizes to zero on a long-lived cluster.\n\n")
        f.write("Cross-round totals carry environment noise in BOTH columns:\n")
        f.write("round 6 A/B'd the round-3 tree interleaved with the current one\n")
        f.write("on the same box — identical r3 code measured 6.3-8.2s on the\n")
        f.write("11-query headline (spanning every recorded round total), and\n")
        f.write("DuckDB's full-sweep total measured ~59s in r6 vs ~108s recorded\n")
        f.write("in r4 with materially identical oracle SQL. Treat round-over-\n")
        f.write("round TOTAL deltas under ~2x as environment until a per-key\n")
        f.write("exec_s regression confirms them; exec_s is the stable signal.\n\n")
        f.write("The sink_*/source_*/stream_rate_source rows compare asymmetric\n")
        f.write("work BY DESIGN: Spark writes + re-reads real files (or runs real\n")
        f.write("micro-batches) while the oracle only recomputes the expected\n")
        f.write("values from the source table to VERIFY that round trip — their\n")
        f.write("ratios measure the cost of the side effect, not engine speed. For\n")
        f.write("those keys the side effect runs at DataFrame-BUILD time, so exec_s\n")
        f.write("only re-reads the few-row verification result; spark_s is the\n")
        f.write("honest cost of the side effect itself.\n\n")
        f.write("The MR-compat rows (mr_api, q_mr_join) measure the per-record\n")
        f.write("Python lane BY DESIGN: the compat API exists so a JsMr job ports\n")
        f.write("verbatim, and its docstrings point at the Tier-B DataFrame twin\n")
        f.write("(same computation, JVM-side) that every real query should use —\n")
        f.write("q_text_wordcount and q_join_inner/q_join_broadcast run the same\n")
        f.write("work at two orders of magnitude lower cost in this table.\n\n")
        f.write("| key | duckdb_s | spark_s | exec_s | ratio |\n|---|---|---|---|---|\n")
        # 6-dp timings: the resume cache reseeds from these cells
        # (cache_from_md), and at 3 dp a millisecond-scale key's
        # recomputed ratio picked up ~25% rounding error (ADVICE r9) —
        # micro-second precision keeps reseeded ratios faithful to the
        # original measurement.
        for name, d, s, e, r in rows:
            f.write(f"| {name} | {d:.6f} | {s:.6f} | {e:.6f} | {r:.2f} |\n")
        tot_d = sum(r[1] for r in rows); tot_s = sum(r[2] for r in rows)
        tot_e = sum(r[3] for r in rows)
        f.write(f"| **TOTAL** | {tot_d:.3f} | {tot_s:.3f} | {tot_e:.3f} | {tot_s/tot_d:.2f} |\n")
        # Engine-comparable subtotal: drop the BY-DESIGN asymmetric
        # side-effect keys (sink_*/source_*/stream_* run real writes /
        # micro-batches on Spark while the oracle only recomputes the
        # expected values — their ratio prices the side effect, not the
        # engine). What remains is the pure-query surface both engines
        # genuinely execute.
        def _sidefx(name: str) -> bool:
            return name.startswith(("sink_", "source_", "stream_"))
        q_rows = [r for r in rows if not _sidefx(r[0])]
        q_d = sum(r[1] for r in q_rows); q_s = sum(r[2] for r in q_rows)
        q_e = sum(r[3] for r in q_rows)
        f.write(
            f"| **TOTAL (engine-comparable: {len(q_rows)} pure-query keys,"
            f" side-effect rows excluded)** | {q_d:.3f} | {q_s:.3f} |"
            f" {q_e:.3f} | {q_s/q_d:.2f} |\n"
        )
        if ab_tail:
            f.write("\n" + ab_tail)
    print(json.dumps({
        "total_duck": round(tot_d,3), "total_spark": round(tot_s,3),
        "total_exec": round(tot_e,3), "n": len(rows),
        "query_duck": round(q_d,3), "query_spark": round(q_s,3),
        "query_exec": round(q_e,3), "n_query": len(q_rows)}))


if __name__ == "__main__":
    if "--cache-from-md" in sys.argv:
        idx = sys.argv.index("--cache-from-md")
        if idx + 1 >= len(sys.argv):
            sys.exit("--cache-from-md requires a cache-file path")
        cache_from_md(sys.argv[idx + 1])
    else:
        main()
