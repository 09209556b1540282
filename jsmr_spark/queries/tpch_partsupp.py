"""TPC-H Q2/Q9/Q11/Q16/Q20 shapes over a DERIVED partsupp view.

The fixture set has no partsupp table (TESTDATA.md), so the five
remaining TPC-H queries — the ones upstream expresses against partsupp
— run here against a deterministic partsupp-analog derived from
lineitem: one (part, supplier) row per observed pair, with

    ps_availqty      = CAST(sum(l_quantity) AS BIGINT)   -- lifetime qty
    ps_supplycost_bp = min(unit price in integer basis points)

Unit price is computed as ``cents(l_extendedprice) * 100 div qty`` —
pure positive-integer floor division, bit-identical in Spark (`div`)
and DuckDB (`//`), so no float rounding tie can ever split the hash
(the compat-module round guarantee only covers fixed-2dp inputs, which
a price/qty quotient is not). With the view fixed, each query below is
the upstream query SHAPE unchanged: the same join graph, the same
correlated-subquery/decorrelation structure, the same aggregation and
ordering semantics, with filter constants re-parameterized to this
fixture's vocabulary (p_type ∈ {ECONOMY..STANDARD}, adjective-noun
p_name, no s_comment column — Q16's complaint filter becomes an
acctbal predicate, preserving the NOT-IN-subquery shape).

Scale notes (100 TB): the view is one map-side-combined groupBy of
three narrow columns — the standard first shuffle of any fact-derived
dimension. Downstream it is partsupp-sized (|parts|×avg suppliers), so
joins against it stay shuffle joins with AQE free to broadcast at
small SF; nothing here collects to the driver. Sums accumulate in
BIGINT basis points (exact, 8-byte hash-agg fast path); at extreme SF
the documented upgrade is DECIMAL(38,0) accumulators, same shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.compat import cents, pct, r4
from jsmr_spark.queries.common import t
from jsmr_spark.registry import query

# DuckDB twin of _partsupp() below — prepended to every oracle.
_PS_CTE = """
partsupp AS (
  SELECT l_partkey AS ps_partkey,
         l_suppkey AS ps_suppkey,
         CAST(sum(l_quantity) AS BIGINT) AS ps_availqty,
         min(CAST(round(l_extendedprice*100, 0) AS BIGINT) * 100
             // CAST(l_quantity AS BIGINT)) AS ps_supplycost_bp
  FROM lineitem
  GROUP BY 1, 2
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp view (see module docstring)."""
    l = t(spark, sf_dir, "lineitem")
    unit_bp = (cents(F.col("l_extendedprice")) * 100).cast("long")
    qty = F.col("l_quantity").cast("long")
    # Exact floor division of positive ints: the numerator is made
    # exactly divisible first, so the double `/` is exact (< 2^53)
    # and the long cast cannot truncate. Equivalent to SQL `div`/`//`.
    unit_cost = ((unit_bp - unit_bp % qty) / qty).cast("long")
    return (
        l.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            qty.alias("q"),
            unit_cost.alias("u"),
        )
        .groupBy("ps_partkey", "ps_suppkey")
        .agg(
            F.sum("q").alias("ps_availqty"),
            F.min("u").alias("ps_supplycost_bp"),
        )
    )


@query(
    "q_tpch_q2",
    f"""
    WITH {_PS_CTE},
    eur AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost_bp,
             s.s_name, s.s_acctbal, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT rnk, s_acctbal, s_name, n_name, p_partkey, p_name,
           round(ps_supplycost_bp / 10000.0, 4) AS supplycost
    FROM (
      SELECT e.*, p.p_partkey, p.p_name,
             row_number() OVER (
               ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
             ) AS rnk
      FROM part p
      JOIN eur e ON e.ps_partkey = p.p_partkey
      WHERE p.p_type = 'LARGE' AND p.p_size <= 10
        AND e.ps_supplycost_bp = (
          SELECT min(e2.ps_supplycost_bp) FROM eur e2
          WHERE e2.ps_partkey = p.p_partkey
        )
    ) x
    WHERE rnk <= 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every LARGE small
    part, the EUROPE supplier(s) offering the regional minimum supply
    cost — upstream's correlated MIN subquery, implemented in the
    decorrelated form Catalyst would rewrite it into: a per-part
    regional-min aggregate joined back on (partkey, cost) equality.
    Cost equality compares exact BIGINT basis points, so the
    min-selection can never split on a float ulp.

    Plan: supplier/nation/region broadcast onto the derived partsupp;
    the min-aggregate reuses the same regional frame (one shuffle on
    ps_partkey); the final top-100 is a single-column row_number over
    a deterministic total order (acctbal DESC, nation, supplier,
    part), i.e. TakeOrdered pressure, not a global sort."""
    ps = _partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    eur = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_suppkey", "ps_supplycost_bp", "s_name", "s_acctbal", "n_name")
    )
    # Self-join of the regional frame against its own per-part min:
    # rename the agg side so the compound join condition is unambiguous.
    min_cost = eur.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost_bp").alias("min_cost_bp")
    )
    joined = (
        p.join(eur, eur.ps_partkey == p.p_partkey)
        .join(
            min_cost,
            (F.col("mc_partkey") == F.col("p_partkey"))
            & (F.col("ps_supplycost_bp") == F.col("min_cost_bp")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost_bp")
    )
    keys = [F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey")]
    top = joined.orderBy(*keys).limit(100)  # TakeOrdered; window sees 100 rows
    return (
        top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))
        .select(
            "rnk",
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            r4(F.col("ps_supplycost_bp") / 10000.0).alias("supplycost"),
        )
    )


@query(
    "q_tpch_q9",
    f"""
    WITH {_PS_CTE}
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           round(sum(CAST(round(l.l_extendedprice*100,0) AS BIGINT)
                     * (100 - CAST(round(l.l_discount*100,0) AS BIGINT))
                     - ps.ps_supplycost_bp * CAST(l.l_quantity AS BIGINT)
                    ) / 10000.0, 4) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): nation×year profit over
    widget parts, where profit = discounted revenue − supply cost ×
    quantity — the 6-table join with a compound (partkey, suppkey)
    join back onto partsupp. Every term is exact BIGINT basis points
    (revenue = cents × (100−pct); cost = unit-bp × integral qty), so
    the sum is order-independent and one final division presents it.

    Plan: part filter broadcasts; the lineitem→partsupp join is the
    compound-key shuffle upstream pays too (both sides partition on
    (partkey, suppkey)); orders joins on the already-shuffled orderkey
    side; nation broadcasts onto the supplier dim."""
    ps = _partsupp(spark, sf_dir)
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    profit_bp = cents(F.col("l_extendedprice")) * (100 - pct(F.col("l_discount"))) - F.col(
        "ps_supplycost_bp"
    ) * F.col("l_quantity").cast("long")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(ps, (l.l_partkey == ps.ps_partkey) & (l.l_suppkey == ps.ps_suppkey))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(r4(F.sum(profit_bp) / 10000.0).alias("sum_profit"))
    )


@query(
    "q_tpch_q11",
    f"""
    WITH {_PS_CTE},
    eur AS (
      SELECT ps.ps_partkey, ps.ps_supplycost_bp * ps.ps_availqty AS v
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    vals AS (SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_bp FROM eur GROUP BY 1)
    SELECT ps_partkey, value_bp
    FROM vals
    WHERE value_bp > (SELECT CAST(sum(value_bp) AS BIGINT) // (2 * count(*)) FROM vals)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part inventory value
    (supplycost × availqty) restricted to EUROPE suppliers, keeping
    parts above a fraction of the GLOBAL total — upstream's scalar-
    subquery threshold. Upstream's fraction is 0.0001/SF (re-tuned per
    scale factor); here the cut is half the MEAN per-part value
    (sum div (2·count)), which is the same shape but scale-stable: the
    filter stays selective-but-nonempty at every SF without retuning.
    The threshold is BIGINT floor division on both engines — no float
    compare at the cut line.

    Plan: one shuffle groups by ps_partkey; the global total is a
    partial-aggregated scalar broadcast back as a literal-free cross
    join of a 1-row frame — no collect, no second scan of lineitem
    (the derived view is reused for both branches)."""
    ps = _partsupp(spark, sf_dir)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_bp") * F.col("ps_availqty")).alias("v"),
        )
    )
    vals = eur.groupBy("ps_partkey").agg(F.sum("v").cast("long").alias("value_bp"))
    thresh = vals.agg(
        F.expr("CAST(sum(value_bp) AS BIGINT) div (2 * count(*))").alias("thresh_bp")
    )
    return (
        vals.join(F.broadcast(thresh))
        .filter(F.col("value_bp") > F.col("thresh_bp"))
        .select("ps_partkey", "value_bp")
    )


@query(
    "q_tpch_q16",
    f"""
    WITH {_PS_CTE}
    SELECT p_brand, p_type, p_size, supplier_cnt,
           row_number() OVER (
             ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
           ) AS rnk
    FROM (
      SELECT p.p_brand, p.p_type, p.p_size,
             count(DISTINCT ps.ps_suppkey) AS supplier_cnt
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey
      WHERE p.p_brand <> 'Brand#3'
        AND p.p_type <> 'PROMO'
        AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
        )
      GROUP BY 1, 2, 3
    ) x
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier-count by part descriptor): distinct
    suppliers per (brand, type, size) over filtered parts, excluding a
    supplier subset via NOT IN — upstream's complaint-comment exclusion
    re-parameterized to an acctbal predicate (the fixture has no
    s_comment column), shape intact. The NOT IN decorrelates to a
    broadcast anti-join (s_suppkey is non-null, so NOT IN ≡ anti).

    Plan: part broadcasts onto the derived partsupp; the excluded-
    supplier set broadcasts as an anti-join; count(DISTINCT) is the
    standard two-phase expand/agg; the presentation order is encoded
    as a row_number over a deterministic total order (the grouping
    key itself breaks count ties)."""
    ps = _partsupp(spark, sf_dir)
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 2000).select("s_suppkey")
    grouped = (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )
    keys = [F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("p_type"), F.col("p_size")]
    # Group count is structurally bounded by the descriptor key space
    # (|brands| × |types| × 8 listed sizes ≤ 1200 at any SF), so the
    # limit keeps every row while routing the plan through TakeOrdered
    # — the presentation window then ranks a bounded set.
    top = grouped.orderBy(*keys).limit(2000)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys))).select(
        "p_brand", "p_type", "p_size", "supplier_cnt", "rnk"
    )


@query(
    "q_tpch_q20",
    f"""
    WITH {_PS_CTE},
    q97 AS (
      SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty97
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT s_name, n_name, rnk FROM (
      SELECT s.s_name, n.n_name,
             row_number() OVER (ORDER BY s.s_name) AS rnk
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
        AND s.s_suppkey IN (
          SELECT ps.ps_suppkey
          FROM partsupp ps
          JOIN q97 ON q97.l_partkey = ps.ps_partkey AND q97.l_suppkey = ps.ps_suppkey
          JOIN part p ON p.p_partkey = ps.ps_partkey
          WHERE p.p_name LIKE 'large %'
            AND 2 * q97.qty97 > ps.ps_availqty
        )
    ) x WHERE rnk <= 100
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (part promotion candidates): ASIA suppliers
    holding a fast-moving 'large *' part — upstream's nested IN
    (partsupp filtered by a correlated per-(part,supplier) quantity
    aggregate). Upstream compares availqty > 0.5 × window-qty; with
    availqty derived as LIFETIME quantity that direction is vacuous,
    so the inequality is flipped to 'more than half the lifetime
    supply shipped in 1997' — same correlated structure, selective
    predicate, pure-integer compare (2×qty97 > availqty).

    Plan: the correlated agg decorrelates to a compound-key join of
    two groupBys over the same lineitem scan; part filter broadcasts;
    the IN becomes a semi-join onto the 10-100 row supplier dim;
    nation/region broadcast."""
    ps = _partsupp(spark, sf_dir)
    l = t(spark, sf_dir, "lineitem")
    q97 = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty97"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("large %"))
    fast = (
        ps.join(q97, (q97.l_partkey == ps.ps_partkey) & (q97.l_suppkey == ps.ps_suppkey))
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .filter(2 * F.col("qty97") > F.col("ps_availqty"))
        .select("ps_suppkey")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    kept = (
        s.join(fast, s.s_suppkey == fast.ps_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_name", "n_name")
    )
    top = kept.orderBy("s_name").limit(100)  # TakeOrdered; presentation top-100
    return top.withColumn("rnk", F.row_number().over(Window.orderBy("s_name")))
