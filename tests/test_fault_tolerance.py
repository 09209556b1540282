"""Task-retry fault tolerance (VERDICT r9 "single-machine validation
only" gap, the testable slice): Spark's recovery contract is that a
task attempt may die and be re-run on another executor without
changing the result. local mode can't kill an executor, but it CAN
retry tasks — `local[N, maxFailures]` — and TaskContext exposes the
attempt number, so a deterministic first-attempt crash exercises the
exact recovery path a 1000-executor cluster depends on.

Each scenario runs in a SUBPROCESS because the retrying master string
must be set at SparkContext creation and the test session (one JVM,
one context) already exists.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

_PRELUDE = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4, 2]")  # 2 task attempts
    .appName("jsmr_fault_tolerance")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
"""


def _run(body: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", _PRELUDE + textwrap.dedent(body)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_aggregate_survives_first_attempt_crash():
    """A (deliberately) crashing first attempt of one task must not
    change an aggregation result: the retried attempt reprocesses the
    SAME input split, so exactly-once per-split semantics hold."""
    out = _run(
        """
        from pyspark import TaskContext

        def crash_once(it):
            tc = TaskContext.get()
            if tc.partitionId() == 1 and tc.attemptNumber() == 0:
                raise RuntimeError("injected first-attempt failure")
            for row in it:
                yield row

        df = spark.range(0, 10000, 1, 4)
        survived = df.rdd.mapPartitions(crash_once).map(lambda r: r.id).sum()
        print("SUM", int(survived))
        """
    )
    assert "SUM 49995000" in out


def test_shuffle_map_side_retry_is_exactly_once():
    """Crash a map-side task of a shuffle once: the reduce side must
    see each record exactly once (no double-count from the dead
    attempt's partial output)."""
    out = _run(
        """
        from pyspark import TaskContext

        def crash_once(it):
            tc = TaskContext.get()
            if tc.partitionId() == 0 and tc.attemptNumber() == 0:
                raise RuntimeError("injected map-side failure")
            for x in it:
                yield (x % 7, 1)

        rdd = spark.sparkContext.parallelize(range(70000), 4)
        counts = dict(rdd.mapPartitions(crash_once).reduceByKey(
            lambda a, b: a + b).collect())
        print("KEYS", sorted(counts))
        print("VALS", sorted(set(counts.values())))
        """
    )
    assert "KEYS [0, 1, 2, 3, 4, 5, 6]" in out
    assert "VALS [10000]" in out


def test_exhausted_retries_fail_loudly():
    """When every attempt fails, the job must FAIL, not fabricate a
    partial result — silent data loss is the one unforgivable recovery
    behavior."""
    out = _run(
        """
        def always_crash(it):
            raise RuntimeError("injected permanent failure")
            yield  # pragma: no cover

        rdd = spark.sparkContext.parallelize(range(100), 2)
        try:
            rdd.mapPartitions(always_crash).count()
            print("OUTCOME no-error")
        except Exception:
            print("OUTCOME failed-loudly")
        """
    )
    assert "OUTCOME failed-loudly" in out
