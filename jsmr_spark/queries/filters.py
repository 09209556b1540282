"""Projections / filters / predicates (SURVEY.md §2.B).

Reference parity: the filter/project half of JsMr's map() (SURVEY.md
§2.A A3) — a user map function that drops or reshapes records —
expressed as Catalyst Filter/Project nodes so they fold into the scan
(pushdown) instead of running user code per record.

All expressions here are per-row IEEE arithmetic on identical inputs,
so Spark and DuckDB produce bit-identical doubles; round(,4) on
computed doubles is kept as presentation-layer policy (it can never
tie: no binary double sits exactly on a 1e-4 midpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsmr_spark.compat import cents, pct, r4  # noqa: F401
from jsmr_spark.queries.common import t
from jsmr_spark.registry import query


@query(
    "q_project_arith",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT))
             / 10000.0::DOUBLE AS revenue,
           CAST(round(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT))
             * (100 + CAST(round(l_tax*100,0) AS BIGINT)) / 1000000.0::DOUBLE AS charged
    FROM lineitem
    """,
)
def q_project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise arithmetic projection (the TPC-H revenue expression).

    Computed in the exact integer domain: products of 2dp decimals land
    exactly on 4dp midpoints where Spark's half-up and DuckDB's rounding
    genuinely diverge (found by the differential harness), so no float
    round() appears on this path at all.
    """
    price_c = cents(F.col("l_extendedprice"))
    disc_p = pct(F.col("l_discount"))
    tax_p = pct(F.col("l_tax"))
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (price_c * (100 - disc_p) / 10000.0).alias("revenue"),
        (price_c * (100 - disc_p) * (100 + tax_p) / 1000000.0).alias("charged"),
    )


@query(
    "q_project_case",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                WHEN l_quantity < 45 THEN 'large'
                ELSE 'jumbo' END AS qty_bucket,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_return
    FROM lineitem
    """,
)
def q_project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing."""
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .when(F.col("l_quantity") < 45, "large")
        .otherwise("jumbo")
        .alias("qty_bucket"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_return"),
    )


@query(
    "q_filter_eq",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate (pushed to the parquet scan)."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_filter_between",
    """
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
    """,
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range predicate on a timestamp column."""
    return (
        t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").between(
                F.lit("1997-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
            )
        )
        .select("o_orderkey", "o_orderdate")
    )


@query(
    "q_filter_in",
    """
    SELECT o_orderkey, o_orderpriority
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "q_filter_like",
    """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE 'ECO%' OR p_name LIKE '%widget%' OR p_brand LIKE 'Brand#1_'
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE patterns: prefix, contains, single-char wildcard."""
    return (
        t(spark, sf_dir, "part")
        .filter(
            F.col("p_type").like("ECO%")
            | F.col("p_name").like("%widget%")
            | F.col("p_brand").like("Brand#1_")
        )
        .select("p_partkey", "p_name", "p_type")
    )


@query(
    "q_filter_compound",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE (l_returnflag = 'R' AND l_quantity > 30)
       OR (NOT l_linestatus = 'F' AND l_discount BETWEEN 0.05 AND 0.07)
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT combinations."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            ((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30))
            | (~(F.col("l_linestatus") == "F") & F.col("l_discount").between(0.05, 0.07))
        )
        .select("l_orderkey", "l_linenumber")
    )


@query(
    "q_filter_null",
    """
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           (nullif(o_orderstatus, 'P') IS NULL) AS was_p
    FROM orders
    WHERE nullif(o_orderstatus, 'P') IS NULL OR o_orderstatus = 'F'
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics — fixtures are null-free, so nulls are manufactured
    with nullif, then round-tripped through IS NULL / coalesce."""
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
            status_or_null.isNull().alias("was_p"),
        )
        .filter(F.col("status_or_null").isNull() | (F.col("status_or_null") == "F"))
    )
