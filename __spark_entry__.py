"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``jsmr_spark`` package; this module is a
thin adapter over its query registry (jsmr_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_agg_q1, TPC-H-Q1-shape) on /root/testdata/sf0.001."""
    from jsmr_spark.registry import get_query
    from jsmr_spark.session import ensure_engine_confs

    ensure_engine_confs(spark)
    return get_query("q_agg_q1").fn(spark, FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from jsmr_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable key in queries()."""
    from jsmr_spark.registry import all_oracles

    return all_oracles()
