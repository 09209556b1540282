"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jsmr_spark.io import load_table, register_views


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand fixture-table loader."""
    return load_table(spark, sf_dir, name)


def sql(spark: SparkSession, sf_dir: str, stmt: str) -> DataFrame:
    """Run Spark SQL with all fixture tables registered as temp views.

    Used for surface that is clearer in SQL (grouping sets, correlated
    subqueries, lateral UDTF joins). View registration is lazy metadata
    only — no data is read until the plan executes.
    """
    register_views(spark, sf_dir)
    return spark.sql(stmt)
