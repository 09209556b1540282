"""Sorts / limits / top-k and set operations (SURVEY.md §2.B).

Reference parity: JsMr sorts by emitting sortable keys into the
shuffle (SURVEY.md §2.A A5) and set-ops are reduce-side membership
merges; here they are native Sort / TakeOrderedAndProject / set
operators.

The driver's comparison is order-insensitive, so where ordering IS the
semantics the rank is emitted as a column computed under the same
total order (unique tiebreak included).

Scale notes: every ranked key here uses Spark's TakeOrderedAndProject
(per-partition heaps + single merge, no global sort); the rank window
then runs over just the k surviving rows — q_sort_multi included,
since its rn <= 500 predicate makes it a top-k in disguise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.queries.common import t
from jsmr_spark.registry import query


@query(
    "q_sort_multi",
    """
    SELECT o_orderkey, status_or_null, o_totalprice, rn
    FROM (
      SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null, o_totalprice,
             row_number() OVER (ORDER BY nullif(o_orderstatus, 'P') DESC NULLS LAST,
                                o_totalprice ASC, o_orderkey ASC) AS rn
      FROM orders
    ) x
    WHERE rn <= 500
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, mixed direction, NULLS LAST (nulls manufactured
    via nullif); order encoded as a rank column."""
    keys = [
        F.col("status_or_null").desc_nulls_last(),
        F.col("o_totalprice").asc(),
        F.col("o_orderkey").asc(),
    ]
    # rn <= 500 makes this a top-k, not a full sort: orderBy.limit runs
    # as TakeOrderedAndProject and the rank window sees 500 rows.
    top = (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
            "o_totalprice",
        )
        .orderBy(*keys)
        .limit(500)
    )
    return top.withColumn("rn", F.row_number().over(Window.orderBy(*keys)))


@query(
    "q_topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice, rn
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) x
    WHERE rn <= 20
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 with a total order (unique tiebreak). The limit
    executes as TakeOrderedAndProject; the rank window only sees the 20
    survivors."""
    keys = [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    top = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(*keys)
        .limit(20)
    )
    return top.withColumn("rn", F.row_number().over(Window.orderBy(*keys)))


_BIG = "SELECT o_orderkey AS okey FROM orders WHERE o_totalprice > 250000"
_URGENT = "SELECT o_orderkey AS okey FROM orders WHERE o_orderpriority = '1-URGENT'"


def _big(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_orderkey").alias("okey"))
    )


def _urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("okey"))
    )


@query("q_union_all", f"{_BIG} UNION ALL {_URGENT}")
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — overlapping rows kept with multiplicity."""
    return _big(spark, sf_dir).unionAll(_urgent(spark, sf_dir))


@query("q_union_distinct", f"{_BIG} UNION {_URGENT}")
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union."""
    return _big(spark, sf_dir).union(_urgent(spark, sf_dir)).distinct()


@query("q_intersect", f"{_BIG} INTERSECT {_URGENT}")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection."""
    return _big(spark, sf_dir).intersect(_urgent(spark, sf_dir))


@query("q_intersect_all", f"{_BIG} INTERSECT ALL {_URGENT}")
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (multiplicity = min of the two sides)."""
    return _big(spark, sf_dir).intersectAll(_urgent(spark, sf_dir))


@query("q_except", f"{_BIG} EXCEPT {_URGENT}")
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference."""
    return _big(spark, sf_dir).subtract(_urgent(spark, sf_dir))


@query("q_except_all", f"{_BIG} EXCEPT ALL {_URGENT}")
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (multiplicity-aware)."""
    return _big(spark, sf_dir).exceptAll(_urgent(spark, sf_dir))
