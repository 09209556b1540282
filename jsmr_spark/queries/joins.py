"""Join operators (SURVEY.md §2.B "Joins").

Reference parity: JsMr has no join operator — joins are hand-written
map/reduce jobs (tag records by source in map(), merge per key in
reduce(); SURVEY.md §2.A capability argument). Here every join is a
declarative Catalyst join so the planner picks broadcast vs shuffle vs
sort-merge, with explicit hints where the inventory key pins a
physical strategy (asserted in tests/test_plans.py).

Scale notes (100 TB):
  * dims (region/nation/supplier at any SF, customer at small SF)
    broadcast — zero shuffle of the fact side;
  * fact-fact joins shuffle on the join key; AQE skew-join splits hot
    keys at runtime (enabled in session.py);
  * the range/as-of joins are keyed on user_id first, so the window /
    interval logic runs within a user's partition — the shuffle is one
    hash exchange regardless of time span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.compat import cents, pct, r4, sql_cents, sql_pct
from jsmr_spark.queries.common import sql, t
from jsmr_spark.queries.shared_sql import (
    RANGE_JOIN_ORACLE,
    SESSION_GAP_MINUTES,
    SESSION_ISLANDS_CTE,
)
from jsmr_spark.registry import query


@query(
    "q_join_inner",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders x customer."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_join_broadcast",
    """
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension chain with explicit broadcast() — the fact side never
    shuffles (plan asserts BroadcastHashJoin)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@query(
    "q_join_smj",
    """
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def q_join_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join forced to sort-merge via hint — the strategy of
    choice when both sides are huge and neither fits in memory."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").hint("merge")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderdate"
    )


@query(
    "q_join_shuffle_hash",
    """
    SELECT l.l_orderkey, l.l_partkey, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size > 40
    """,
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled hash join (no sort) — wins over SMJ when one side is
    much smaller per partition but too big to broadcast."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") > 40).hint("shuffle_hash")
    return li.join(p, li.l_partkey == p.p_partkey).select("l_orderkey", "l_partkey", "p_brand")


_URGENT = "o_orderpriority = '1-URGENT' AND o_totalprice > 150000"


@query(
    "q_join_left",
    f"""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE {_URGENT}) o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with genuinely unmatched left rows (NULL columns)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_right",
    f"""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey
    FROM (SELECT * FROM orders WHERE {_URGENT}) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (mirror of q_join_left)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey"
    )


@query(
    "q_join_full",
    """
    SELECT c.c_custkey, c.c_nationkey AS cust_nation, s.s_suppkey, s.s_nationkey AS supp_nation
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
    FULL JOIN (SELECT * FROM supplier WHERE s_acctbal > 5000) s
      ON c.c_nationkey = s.s_nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on both sides."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    s = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        F.col("c_custkey"),
        F.col("c_nationkey").alias("cust_nation"),
        F.col("s_suppkey"),
        F.col("s_nationkey").alias("supp_nation"),
    )


@query(
    "q_join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one urgent order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_cross",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (small sides only — 5 x 25)."""
    return t(spark, sf_dir, "region").crossJoin(t(spark, sf_dir, "nation")).select(
        "r_name", "n_name"
    )


@query(
    "q_join_theta",
    """
    SELECT s.s_suppkey, c.c_custkey, s.s_acctbal, c.c_acctbal
    FROM supplier s JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 50 AND s.s_acctbal + 50
    WHERE s.s_acctbal > 0
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join, banded into an equi-join.

    A raw band predicate plans as BroadcastNestedLoop — O(|S| x |C|)
    comparisons, a dead end at fact scale. Because the band half-width
    (50) equals the bin width, a matching c_acctbal always falls in the
    supplier's bin +-1: replicate each supplier row to 3 bins (narrow
    explode), hash-join on the bin, and keep the exact BETWEEN as a
    post-filter. Comparisons drop to sum-of-bin-products and the join
    parallelizes on the bin key like any equi-join (bin width is the
    skew knob). The oracle runs the plain BETWEEN — identical rows."""
    bin_ = F.floor(F.col("s_acctbal") / 50).cast("long")
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 0)
        .withColumn("bin", F.explode(F.array(bin_ - 1, bin_, bin_ + 1)))
    )
    c = t(spark, sf_dir, "customer").withColumn(
        "bin", F.floor(F.col("c_acctbal") / 50).cast("long")
    )
    cond = F.col("c_acctbal").between(F.col("s_acctbal") - 50, F.col("s_acctbal") + 50)
    return (
        s.join(c, "bin")
        .filter(cond)
        .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
    )


@query("q_join_range", RANGE_JOIN_ORACLE)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: click within 5 minutes after a view by the
    same user. Equi key (user_id) drives the shuffle; the time predicate
    evaluates inside each hash partition."""
    ev = t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id"), F.col("ts").alias("v_ts")
    )
    k = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("k_user"), F.col("ts").alias("k_ts")
    )
    joined = v.join(
        k,
        (F.col("user_id") == F.col("k_user"))
        & (F.col("k_ts") > F.col("v_ts"))
        & (F.col("k_ts") <= F.col("v_ts") + F.expr("INTERVAL 5 MINUTES")),
    )
    return joined.select(
        "view_id",
        "click_id",
        "user_id",
        (F.unix_micros(F.col("k_ts")) - F.unix_micros(F.col("v_ts"))).alias("gap_us"),
    )


@query(
    "q_join_asof",
    """
    SELECT p.event_id, p.user_id, p.ts, v.ts AS prior_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest view at-or-before
    it, per user. Spark has no native as-of join; implemented with the
    union-tag + running last(ignorenulls) pattern — one shuffle on
    user_id, one sort within partitions, no self-join blowup.

    Tie rule: at identical timestamps the view sorts before the purchase
    (tag 0 < 1), making the match inclusive — same as DuckDB ASOF's
    p.ts >= v.ts."""
    ev = t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("v_ts"),
        F.lit(0).alias("tag"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("v_ts"),
        F.lit(1).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        views.unionByName(purchases)
        .withColumn("prior_view_ts", F.last("v_ts", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select("event_id", "user_id", "ts", "prior_view_ts")
    )


@query(
    "q_join_multiway",
    f"""
    WITH agg AS (
      SELECT l.l_orderkey,
             sum({sql_cents("l.l_extendedprice")} * (100 - {sql_pct("l.l_discount")})) / 10000.0::DOUBLE
               AS revenue,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15'
        AND l.l_shipdate > TIMESTAMP '1998-03-15'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    )
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority, rnk
    FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS rnk FROM agg) x
    WHERE rnk <= 10
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, aggregate, global top-10 by revenue
    (rank emitted as a column so the hash stays order-insensitive).
    Revenue summed in exact cents x basis-points — cross-engine safe."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice")) * (100 - pct(F.col("l_discount")))) / 10000.0
            ).alias("revenue")
        )
    )
    keys = [F.desc("revenue"), F.asc("l_orderkey")]
    # Global top-10 via orderBy.limit = TakeOrderedAndProject (partial
    # top-k per partition, one 10-row merge); rank the survivors only.
    top = agg.orderBy(*keys).limit(10)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys))).select(
        "l_orderkey", "revenue", "o_orderdate", "o_orderpriority", "rnk"
    )


@query(
    "q_exists_corr",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND c.c_acctbal > 0
    """,
)
def q_exists_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through spark.sql — Catalyst decorrelates it to
    a left semi join (RewritePredicateSubquery)."""
    return sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND c.c_acctbal > 0
        """,
    )


_SCALAR_SUBQ_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE CAST(round(o_totalprice*100,0) AS BIGINT) * (SELECT count(*) FROM orders)
          > (SELECT sum(CAST(round(o_totalprice*100,0) AS BIGINT)) FROM orders)
    """


@query("q_scalar_subq", _SCALAR_SUBQ_SQL)
def q_scalar_subq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate: orders above the global mean price.
    The comparison is done in exact integers (price*count > sum) so the
    threshold itself carries no float summation drift."""
    return sql(spark, sf_dir, _SCALAR_SUBQ_SQL)


@query(
    "q_tpch_q5",
    f"""
    WITH agg AS (
      SELECT n.n_name,
             sum({sql_cents("l.l_extendedprice")} * (100 - {sql_pct("l.l_discount")}))
               / 10000.0::DOUBLE AS revenue
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
                     AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY n.n_name
    )
    SELECT n_name, revenue, rnk
    FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, n_name) AS rnk FROM agg) x
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table local-supplier-volume query — the widest
    join tree in the inventory (customer x orders x lineitem x supplier
    x nation x region plus the non-join-key c_nationkey = s_nationkey
    residual), revenue per nation of one region and year.

    The scale shape: region/nation/supplier collapse into one BROADCAST
    dim (region filter prunes nation, nation prunes supplier) so the
    fact-side plan is lineitem ⋈ broadcast(dim) narrow, then ONE keyed
    shuffle to orders (date-filtered at the scan) and one to customer,
    where the c_nationkey = s_nationkey residual evaluates inside the
    join. Revenue sums exact cents x basis points (order-independent),
    divides once; rank emitted as a column (<=25 nations, bounded by
    construction) so the hash stays order-insensitive."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    li = t(spark, sf_dir, "lineitem")
    agg = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice")) * (100 - pct(F.col("l_discount"))))
                / 10000.0
            ).alias("revenue")
        )
    )
    keys = [F.desc("revenue"), F.asc("n_name")]
    # <=25 nations by construction; orderBy.limit keeps the rank window
    # behind a TakeOrderedAndProject.
    top = agg.orderBy(*keys).limit(25)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys))).select(
        "n_name", "revenue", "rnk"
    )


Q18_MIN_QTY = 250  # "large-volume order" floor (max order qty sum is ~380-475)


@query(
    "q_tpch_q18",
    f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > {Q18_MIN_QTY}
    ),
    agg AS (
      SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             {sql_cents("o.o_totalprice")} AS total_cents,
             CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
      GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, total_cents, sum_qty, rnk
    FROM (SELECT *, row_number() OVER (ORDER BY total_cents DESC, o_orderkey) AS rnk
          FROM agg) x
    WHERE rnk <= 20
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): an aggregate-derived
    HAVING set semi-joins back into the fact table — the
    qualify-then-enrich pattern (find entities crossing a threshold,
    then pull their full context).

    Scale shape: the qualifying set is |orders passing HAVING| rows of
    ONE key column — it re-joins as a semi join that AQE can broadcast
    when selective; the quantity sums are exact (integral quantities
    cast to long); top-20 via TakeOrdered + rank column."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > Q18_MIN_QTY)
        .select("l_orderkey")
    )
    o = t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    c = t(spark, sf_dir, "customer")
    agg = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            cents(F.col("o_totalprice")).alias("total_cents"),
            "sum_qty",
        )
    )
    keys = [F.desc("total_cents"), F.asc("o_orderkey")]
    top = agg.orderBy(*keys).limit(20)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))


@query(
    "q_tpch_q10",
    f"""
    WITH agg AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             sum({sql_cents("l.l_extendedprice")} * (100 - {sql_pct("l.l_discount")}))
               / 10000.0::DOUBLE AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, n_name, revenue, rnk
    FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rnk
          FROM agg) x
    WHERE rnk <= 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item revenue ranking): quarter-filtered
    orders x returned lineitems x customer x broadcast nation, top-20
    customers by lost revenue — the churn-report pattern.

    Scale shape: both fact filters (date range, returnflag) push to the
    scans; nation broadcasts; revenue in exact cents x basis points;
    top-20 via TakeOrdered + rank column."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    agg = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice")) * (100 - pct(F.col("l_discount"))))
                / 10000.0
            ).alias("revenue")
        )
    )
    keys = [F.desc("revenue"), F.asc("c_custkey")]
    top = agg.orderBy(*keys).limit(20)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))


@query(
    "q_tpch_q12",
    f"""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_low
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-priority audit): a date-windowed
    fact-fact join feeding TWO-BRANCH conditional counts per group —
    the 'pivot a predicate into columns' aggregation pattern (the
    fixture has no l_shipmode, so the audit groups by returnflag;
    identical plan shape). Filter pushes to the lineitem scan; the
    counts are map-side-combined longs."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("n_high"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("n_low"),
        )
    )


@query(
    "q_tpch_q14",
    f"""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                   THEN {sql_cents("l.l_extendedprice")} * (100 - {sql_pct("l.l_discount")})
                   ELSE 0 END)
                 / sum({sql_cents("l.l_extendedprice")} * (100 - {sql_pct("l.l_discount")})), 4)
             AS promo_revenue_pct,
           count(*) AS n_lineitems
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): month-filtered lineitem x
    broadcast part, a conditional revenue share — the ratio-of-two-
    aggregates-in-one-pass pattern. Both sums accumulate exact
    cents x basis points (order-independent longs); ONE division at the
    end, r4-rounded on both engines."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = cents(F.col("l_extendedprice")) * (100 - pct(F.col("l_discount")))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            r4(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / F.sum(rev)
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


FUZZY_MAX_DIST = 3  # max edit distance for a candidate alias pair


@query(
    "q_join_fuzzy",
    f"""
    WITH names AS (
      SELECT DISTINCT p_name,
             string_split(p_name, ' ')[-1] AS block
      FROM part
    )
    SELECT a.p_name AS name_a,
           b.p_name AS name_b,
           a.block,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND {FUZZY_MAX_DIST}
    """,
)
def q_join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy (approximate-string) self-join: find near-identical
    part names within an edit distance of {FUZZY_MAX_DIST} — the
    entity-resolution / alias-detection shape (same pattern matches
    customer names, URLs, product titles).

    The two standard scale tricks, both load-bearing:
      1. **Dedup before pairing** — pairs are generated over DISTINCT
         names (the vocabulary), not rows. At 100 TB the name
         vocabulary is orders of magnitude smaller than the fact table,
         and resolved pairs join back to facts by exact key if needed.
      2. **Blocking** — candidate pairs only form inside a block (here
         the last word of the name, i.e. the noun); levenshtein runs
         on the blocked candidate set, never all-pairs. Swapping the
         blocking key for a phonetic code (soundex) or a shingle
         bucket is a one-line change; the join shape is identical.

    The `a.p_name < b.p_name` predicate keeps each unordered pair once.
    Plan: distinct-aggregate, then an equi-join on block with the
    inequality + levenshtein as residual filters — Catalyst keeps the
    equi-part hashable; nothing is quadratic beyond within-block."""
    names = (
        t(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.alias("a")
    b = names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist.between(1, FUZZY_MAX_DIST))
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.block").alias("block"),
            dist.cast("int").alias("dist"),
        )
    )


@query(
    "q_tpch_q6",
    f"""
    SELECT sum({sql_cents("l_extendedprice")} * {sql_pct("l_discount")}) / 10000.0::DOUBLE
             AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): a pure scan-
    aggregate with three conjunctive range predicates and no join —
    the canonical predicate-pushdown benchmark. All three filters reach
    the parquet scan as PushedFilters (asserted for this filter family
    in tests/test_plans.py), so at 100 TB row groups outside the
    shipdate year never leave storage, and the surviving rows fold into
    a single map-side-combined 1-row aggregate: effectively zero
    shuffle. Revenue is summed in exact cents x basis points.

    The BETWEEN on discount mirrors upstream Q6's `disc - 0.01 AND
    disc + 0.01` with the fixture's exact-2dp discount grid (0.05..0.07
    captures three grid points, as in the spec)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents(F.col("l_extendedprice")) * pct(F.col("l_discount"))) / 10000.0)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_tpch_q19",
    f"""
    SELECT sum({sql_cents("l.l_extendedprice")} * (100 - {sql_pct("l.l_discount")}))
             / 10000.0::DOUBLE AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
           AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#7' AND p.p_type = 'LARGE'
           AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#12' AND p.p_type = 'MEDIUM'
           AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    the classic OR-of-conjunctions query that separates planners. The
    naive plan evaluates the whole disjunction AFTER the join; the
    right plan pushes the part-only conjuncts (brand/type/size) and the
    lineitem-only conjuncts (quantity ranges) below the join as
    single-side prefilters derived from the OR (each side keeps the
    union of its branch predicates), then applies the full disjunction
    as the residual. Catalyst does exactly this; at 100 TB the
    prefilter shrinks the part side to the three brands (broadcastable)
    and prunes lineitem row groups on quantity before any join I/O.

    Adapted to the fixture's part schema (p_container does not exist:
    p_type stands in; brands/sizes chosen to select all three
    branches). Revenue in exact cents x basis points."""
    l = t(spark, sf_dir, "lineitem").alias("l")
    p = t(spark, sf_dir, "part").alias("p")
    branch = (
        (
            (F.col("p.p_brand") == "Brand#3")
            & (F.col("p.p_type") == "SMALL")
            & F.col("p.p_size").between(1, 15)
            & F.col("l.l_quantity").between(1, 11)
        )
        | (
            (F.col("p.p_brand") == "Brand#7")
            & (F.col("p.p_type") == "LARGE")
            & F.col("p.p_size").between(1, 25)
            & F.col("l.l_quantity").between(10, 20)
        )
        | (
            (F.col("p.p_brand") == "Brand#12")
            & (F.col("p.p_type") == "MEDIUM")
            & F.col("p.p_size").between(1, 35)
            & F.col("l.l_quantity").between(20, 30)
        )
    )
    return (
        l.join(p, F.col("l.l_partkey") == F.col("p.p_partkey"))
        .filter(branch)
        .agg(
            (
                F.sum(cents(F.col("l.l_extendedprice")) * (100 - pct(F.col("l.l_discount"))))
                / 10000.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_tpch_q4",
    """
    SELECT o.o_orderpriority,
           count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): date-windowed orders
    having AT LEAST ONE late lineitem, counted per priority. The
    fixture has no l_commitdate/l_receiptdate, so "late" is the
    shipdate > orderdate + 90 days proxy — the correlated-EXISTS shape
    is unchanged.

    Plan: Catalyst rewrites the EXISTS into a LEFT SEMI join on
    l_orderkey with the date comparison as the join residual — the
    fact-fact semi never duplicates orders however many lineitems
    match, and the priority count is a map-side-combined aggregate
    over the (already filtered) semi output. At 100 TB both facts
    shuffle once on orderkey; the orders date window is pushed to the
    parquet scan."""
    o = t(spark, sf_dir, "orders").alias("o")
    l = t(spark, sf_dir, "lineitem").alias("l")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            l,
            (F.col("l.l_orderkey") == F.col("o.o_orderkey"))
            & (F.col("l.l_shipdate") > F.col("o.o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q_tpch_q13",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): the two-level
    group-by-of-a-group-by — orders per customer INCLUDING zero-order
    customers (left join, count of the nullable side), then the
    distribution of those counts. The zero bucket is the part a naive
    inner-join version silently drops.

    Plan: one shuffle on custkey for the outer join + first count
    (map-side combine on the orders side), then a second tiny shuffle
    on c_count whose cardinality is bounded by max orders-per-customer
    — the classic big-shuffle-then-small-shuffle funnel. At 100 TB
    the first join is the only real cost and AQE handles any custkey
    skew."""
    c = t(spark, sf_dir, "customer").alias("c")
    o = t(spark, sf_dir, "orders").alias("o")
    return (
        c.join(o, F.col("c.c_custkey") == F.col("o.o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q_tpch_q7",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           sum({sql_cents("l.l_extendedprice")} * (100 - {sql_pct("l.l_discount")}))
             / 10000.0::DOUBLE AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade between two
    nations by year — 4 fact/dim joins plus TWO independent broadcast
    nation lookups (supplier side and customer side) and a symmetric
    pair predicate.

    Plan: both nation copies broadcast (they filter to one row each
    after predicate pushdown through the OR — Catalyst derives
    n_name IN (A,B) for each side); the fact chain shuffles on
    orderkey then custkey/suppkey; the 2-year shipdate window pushes
    to the lineitem scan. Exact cents x basis points."""
    s = t(spark, sf_dir, "supplier").alias("s")
    l = t(spark, sf_dir, "lineitem").alias("l")
    o = t(spark, sf_dir, "orders").alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    n1 = t(spark, sf_dir, "nation").alias("n1")
    n2 = t(spark, sf_dir, "nation").alias("n2")
    pair = (
        (F.col("n1.n_name") == "NATION_3") & (F.col("n2.n_name") == "NATION_7")
    ) | ((F.col("n1.n_name") == "NATION_7") & (F.col("n2.n_name") == "NATION_3"))
    return (
        s.join(l, F.col("s.s_suppkey") == F.col("l.l_suppkey"))
        .join(o, F.col("o.o_orderkey") == F.col("l.l_orderkey"))
        .join(c, F.col("c.c_custkey") == F.col("o.o_custkey"))
        .join(F.broadcast(n1), F.col("s.s_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("c.c_nationkey") == F.col("n2.n_nationkey"))
        .filter(
            pair
            & (F.col("l.l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l.l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l.l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            (
                F.sum(cents(F.col("l.l_extendedprice")) * (100 - pct(F.col("l.l_discount"))))
                / 10000.0
            ).alias("revenue")
        )
    )


@query(
    "q_tpch_q15",
    f"""
    WITH rev AS (
      SELECT l_suppkey,
             sum({sql_cents("l_extendedprice")} * (100 - {sql_pct("l_discount")}))
               AS total_bp
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_bp / 10000.0::DOUBLE AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_bp = (SELECT max(total_bp) FROM rev)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    return the supplier(s) achieving the maximum — the
    aggregate-then-filter-by-global-aggregate pattern (upstream models
    it as a view + scalar subquery).

    Exactness makes the tie semantics portable: revenue is compared in
    exact basis-point LONGS (ties are real equality, not float
    coincidence), and all maximal suppliers are returned, as in the
    spec. Plan: one keyed aggregate over the date-windowed scan, then a
    1-row max aggregate broadcast against the (already tiny,
    supplier-cardinality) revenue table — the fact table is scanned
    once."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(cents(F.col("l_extendedprice")) * (100 - pct(F.col("l_discount")))).alias(
            "total_bp"
        )
    )
    mx = F.broadcast(rev.agg(F.max("total_bp").alias("mx")))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(mx)
        .filter(F.col("total_bp") == F.col("mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_bp") / 10000.0).alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q17",
    f"""
    WITH pp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#5'),
    li AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN pp ON l.l_partkey = pp.p_partkey
    ),
    avgq AS (SELECT l_partkey, avg(l_quantity) AS aq FROM li GROUP BY l_partkey)
    SELECT sum({sql_cents("li.l_extendedprice")}) / 100.0 / 7.0::DOUBLE AS avg_yearly,
           count(*) AS n_items
    FROM li JOIN avgq ON li.l_partkey = avgq.l_partkey
    WHERE li.l_quantity < 0.2 * avgq.aq
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems of one
    brand whose quantity is below 20% of that part's OWN average
    quantity — the correlated-scalar-aggregate query, implemented in
    its decorrelated form (per-part average once, joined back) on both
    engines so the plan is explicit: this is what Catalyst/DuckDB
    rewrite the correlated subquery into anyway.

    Determinism: quantities are integral doubles, so per-part sum and
    count are exact and avg/0.2-scaling are identical IEEE ops on both
    engines. Revenue sums exact cents. Plan at 100 TB: the brand
    filter broadcasts a small part-id set; lineitem is scanned ONCE,
    semi-reduced, and the per-part aggregate + back-join shuffle on
    l_partkey (same key both times, one exchange reused)."""
    pp = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5").select("p_partkey")
    li = (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(pp), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    avgq = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
    return (
        li.join(avgq.withColumnRenamed("l_partkey", "ak"), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            (F.sum(cents(F.col("l_extendedprice"))) / 100.0 / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_tpch_q22",
    f"""
    WITH pos AS (
      SELECT sum({sql_cents("c_acctbal")}) AS s, count(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    ),
    rich AS (
      SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
      FROM customer c, pos
      WHERE {sql_cents("c.c_acctbal")} * pos.n > pos.s
    )
    SELECT r.c_mktsegment,
           count(*) AS n_custs,
           sum({sql_cents("r.c_acctbal")}) / 100.0::DOUBLE AS total_acctbal
    FROM rich r
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = r.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1999-01-01'
    )
    GROUP BY r.c_mktsegment
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with an
    above-average positive balance with NO RECENT orders (none since
    1999 — the fixture's order history covers every customer, so the
    spec's never-ordered predicate is windowed; the anti-join shape is
    unchanged), grouped by market segment (no phone country code in
    the fixture, so segment is the grouping). Three classic pieces in one query: a global
    scalar aggregate threshold, an anti join against the fact table,
    and a final rollup.

    Exactness: the above-average comparison is EXACT integer
    cross-multiplication — cents(balance) * N > sum_cents — no
    division, no float threshold, so boundary customers land
    identically on both engines. Plan: the 1-row (sum, count)
    aggregate broadcasts; the anti join shuffles customer vs the
    orders custkey projection (at 100 TB: orders side reduces to
    distinct custkeys map-side via the semi-anti optimization);
    segment rollup is map-side-combined."""
    c = t(spark, sf_dir, "customer")
    pos = F.broadcast(
        c.filter(F.col("c_acctbal") > 0.0).agg(
            F.sum(cents(F.col("c_acctbal"))).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(pos)
        .filter(cents(F.col("c_acctbal")) * F.col("n") > F.col("s"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            (F.sum(cents(F.col("c_acctbal"))) / 100.0).alias("total_acctbal"),
        )
    )


@query(
    "q_tpch_q8",
    f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             n2.n_name AS supp_nation,
             {sql_cents("l.l_extendedprice")} * (100 - {sql_pct("l.l_discount")}) AS v
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END) AS DOUBLE)
                 / sum(v), 4) AS mkt_share,
           count(*) AS n_items
    FROM vol GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's share of
    STANDARD-part revenue sold into ASIA-region customers, by order
    year — the conditional-share-of-total rollup over a 7-table join
    (two independent nation lookups again, plus the region dim chained
    off the customer side).

    Exactness: the share is one double division of two exact
    basis-point integer sums (conditional numerator in fixed CASE
    form), rounded r4 — no float accumulation anywhere. Plan: region,
    both nations, and the type-filtered part side all broadcast; the
    fact chain shuffles orderkey then custkey; date window pushes to
    the orders scan."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").alias("p")
    l = t(spark, sf_dir, "lineitem").alias("l")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    n1 = t(spark, sf_dir, "nation").alias("n1")
    n2 = t(spark, sf_dir, "nation").alias("n2")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").alias("r")
    v = cents(F.col("l.l_extendedprice")) * (100 - pct(F.col("l.l_discount")))
    vol = (
        l.join(F.broadcast(p), F.col("p.p_partkey") == F.col("l.l_partkey"))
        .join(o, F.col("o.o_orderkey") == F.col("l.l_orderkey"))
        .join(c, F.col("c.c_custkey") == F.col("o.o_custkey"))
        .join(F.broadcast(n1), F.col("c.c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == F.col("r.r_regionkey"))
        .join(t(spark, sf_dir, "supplier").alias("s"), F.col("s.s_suppkey") == F.col("l.l_suppkey"))
        .join(F.broadcast(n2), F.col("s.s_nationkey") == F.col("n2.n_nationkey"))
        .select(
            F.year("o.o_orderdate").cast("int").alias("o_year"),
            F.col("n2.n_name").alias("supp_nation"),
            v.alias("v"),
        )
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("v")).otherwise(0))
    return vol.groupBy("o_year").agg(
        r4(num.cast("double") / F.sum("v")).alias("mkt_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q_tpch_q21",
    """
    WITH late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    all_sup AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    multi AS (
      SELECT l_orderkey FROM all_sup GROUP BY l_orderkey HAVING count(*) >= 2
    ),
    sole_late AS (
      SELECT l_orderkey FROM late GROUP BY l_orderkey HAVING count(*) = 1
    )
    SELECT s.s_name, numwait, rnk FROM (
      SELECT late.l_suppkey, count(*) AS numwait,
             row_number() OVER (ORDER BY count(*) DESC, late.l_suppkey) AS rnk
      FROM late
      JOIN multi ON late.l_orderkey = multi.l_orderkey
      JOIN sole_late ON late.l_orderkey = sole_late.l_orderkey
      GROUP BY late.l_suppkey
    ) x JOIN supplier s ON s.s_suppkey = x.l_suppkey
    WHERE rnk <= 10
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): count, per
    supplier, the multi-supplier orders where THAT supplier was the
    ONLY late one — upstream's EXISTS(other supplier) AND NOT
    EXISTS(other late supplier) pair, implemented in the decorrelated
    form both optimizers rewrite it into: a late (order, supplier) set,
    an order-has-≥2-suppliers set, and an order-has-exactly-1-late-
    supplier set, intersected by keyed joins ("late" uses the fixture's
    shipdate > orderdate + 90d proxy, as in q_tpch_q4; numwait counts
    qualifying ORDERS per supplier — the distinct form, identical on
    both engines by construction).

    Plan at 100 TB: three aggregates over the same orderkey-shuffled
    lineitem projection (the exchange is reused), two cheap keyed
    joins, a supplier-sized count, TakeOrdered top-10. No correlated
    execution, nothing quadratic."""
    l = t(spark, sf_dir, "lineitem").alias("l")
    o = t(spark, sf_dir, "orders").alias("o")
    late = (
        l.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .filter(F.col("l.l_shipdate") > F.col("o.o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_sup = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    multi = (
        all_sup.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("l_orderkey")
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("nl"))
        .filter(F.col("nl") == 1)
        .select("l_orderkey")
    )
    counts = (
        late.join(multi, "l_orderkey")
        .join(sole_late, "l_orderkey")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    keys = [F.desc("numwait"), F.asc("l_suppkey")]
    top = counts.orderBy(*keys).limit(10)
    ranked = top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))
    s = t(spark, sf_dir, "supplier")
    return ranked.join(s, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_name", "numwait", "rnk"
    )


Q3_CUTOFF = "1996-07-01"  # mid-range of the synthetic 1995-2001 order dates


@query(
    "q_tpch_q3",
    f"""
    WITH agg AS (
      SELECT l.l_orderkey,
             sum({sql_cents("l.l_extendedprice")} * (100 - {sql_pct("l.l_discount")}))
               / 10000.0::DOUBLE AS revenue,
             o.o_orderdate, o.o_orderpriority
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
        AND l.l_shipdate  > TIMESTAMP '{Q3_CUTOFF}'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    )
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority, rnk
    FROM (SELECT *, row_number() OVER (
            ORDER BY revenue DESC, o_orderdate, l_orderkey) AS rnk
          FROM agg) x
    WHERE rnk <= 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped-revenue top-10 for
    one market segment — the last missing query of the TPC-H 1-22 set
    (Q1 lives as q_agg_q1; this synthetic schema has no o_shippriority,
    so o_orderpriority plays its role in the group-by/projection).

    Scale shape: the BUILDING filter keeps ~1/5 of customer, which is a
    broadcastable key-set even at large SF (customer is the smallest
    fact); orders is date-pruned at the scan, lineitem's l_shipdate
    predicate is pushed down, and the plan is lineitem ⋈ orders (one
    keyed shuffle) ⋈ broadcast(filtered customer keys). The group-by
    key (l_orderkey) is the same key as the join, so AQE can reuse the
    exchange. Revenue is exact cents x basis points summed
    order-independently, divided once; the top-10 is a
    TakeOrderedAndProject (no global sort), rank emitted as a column
    with a total tiebreak (revenue, o_orderdate, l_orderkey) so the
    hash is order-insensitive."""
    cut = F.lit(Q3_CUTOFF).cast("timestamp")
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    agg = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice")) * (100 - pct(F.col("l_discount"))))
                / 10000.0
            ).alias("revenue")
        )
    )
    keys = [F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey")]
    top = agg.orderBy(*keys).limit(10)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys))).select(
        "l_orderkey", "revenue", "o_orderdate", "o_orderpriority", "rnk"
    )


# --- interval overlap join --------------------------------------------

IVL_SPINE_START = "2024-01-01 00:00:00"
IVL_SPINE_END = "2024-01-30 23:00:00"
IVL_WIN_MIN = 15  # maintenance window length, minutes

# Gaps-and-islands session CTE: the SAME shared fragment as the
# q_stream_session oracle (jsmr_spark/queries/shared_sql.py), so the
# gap rule and tie-break can never diverge between the two keys.
_IVL_SESS_SQL = f"""
    WITH {SESSION_ISLANDS_CTE},
    sess AS (
      SELECT user_id,
             min(ts) AS s_start,
             max(ts) + INTERVAL {SESSION_GAP_MINUTES} minutes AS s_end
      FROM numbered GROUP BY user_id, sid
    )
"""


@query(
    "q_join_interval",
    f"""
    {_IVL_SESS_SQL},
    win AS (
      SELECT unnest(generate_series(TIMESTAMP '{IVL_SPINE_START}',
                                    TIMESTAMP '{IVL_SPINE_END}',
                                    INTERVAL 1 hour)) AS window_start
    )
    SELECT w.window_start,
           count(*) AS n_sessions,
           count(DISTINCT s.user_id) AS n_users
    FROM win w
    JOIN sess s
      ON s.s_start < w.window_start + INTERVAL {IVL_WIN_MIN} minutes
     AND w.window_start < s.s_end
    GROUP BY w.window_start
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join: user sessions (10-minute-gap
    session_window, the proven-portable q_stream_session derivation)
    against an hourly spine of {IVL_WIN_MIN}-minute maintenance
    windows, matched on the half-open overlap predicate
    s_start < w_end AND w_start < s_end — the operator Spark has no
    native form for and a naive theta join makes O(n*m).

    Blocking: each maintenance window lies entirely inside one hour
    bucket, and each session EXPLODES to the hour buckets it spans
    (sequence over date_trunc'd hours — sessions are minutes long, so
    the fan-out is 1-2 rows), turning the overlap join into a bucket
    EQUI-join plus the exact predicate as a residual filter; every
    overlapping pair shares exactly the window's own bucket, so no
    dedup pass is needed. At 100 TB both sides shuffle on the hour
    key — candidate pairs scale with temporal locality, never n*m.
    The oracle runs the honest theta join (DuckDB plans it as an
    IEJoin) over the same gaps-and-islands sessions."""
    sess = (
        t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
        )
    )
    win = (
        spark.range(1)
        .select(
            F.explode(
                F.expr(
                    f"sequence(timestamp'{IVL_SPINE_START}',"
                    f" timestamp'{IVL_SPINE_END}', interval 1 hour)"
                )
            ).alias("window_start")
        )
        .withColumn("bucket", F.col("window_start"))
    )
    sess_b = sess.withColumn(
        "bucket",
        F.explode(
            F.expr(
                "sequence(date_trunc('hour', s_start),"
                " date_trunc('hour', s_end), interval 1 hour)"
            )
        ),
    )
    w_end = F.col("window_start") + F.expr(f"interval {IVL_WIN_MIN} minutes")
    return (
        win.join(sess_b, "bucket")
        .filter((F.col("s_start") < w_end) & (F.col("window_start") < F.col("s_end")))
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "q_join_lateral",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (SQL:1999 LATERAL, Spark 3.2+):
    top-2 orders per customer written as a per-row subquery instead of
    the window-function form (q_win_topk_group). Catalyst decorrelates
    the LATERAL into a join + per-key limit, so the declarative "for
    each customer, run this ordered sub-select" costs one keyed shuffle
    — users porting LATERAL-heavy warehouse SQL keep their query text
    and still get a distributed plan, which is the point of this key.

    (o_orderkey tiebreak makes the top-2 total; o_totalprice is a raw
    parquet double read identically by both engines, so no rounding
    recipe is needed.)"""
    return sql(
        spark,
        sf_dir,
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """,
    )


_EXISTENCE_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
       OR o_totalprice > 400000
    """


@query("q_join_existence", _EXISTENCE_SQL)
def q_join_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExistenceJoin: an IN-subquery under OR cannot be planned as a
    plain semi join (rows failing the subquery must survive via the
    other disjunct), so Catalyst plans the distinct ExistenceJoin
    variant — a semi join that RETURNS the match flag as a column
    instead of filtering, leaving the disjunction to a post-join
    filter. The remaining physical join type in the join-surface
    matrix (inner/outer/semi/anti/cross/existence); the plan shape is
    asserted in tests. Small dim side broadcasts like any semi join;
    the fact side never duplicates rows (existence, not inner)."""
    return sql(spark, sf_dir, _EXISTENCE_SQL)


NEAREST_GAP_US = 3_600_000_000  # 1 hour


@query(
    "q_join_asof_nearest",
    f"""
    WITH c AS (
      SELECT event_id AS click_id, user_id, epoch_us(ts) AS tc
      FROM events WHERE event_type = 'click'
    ),
    v AS (
      SELECT event_id AS view_id, user_id, epoch_us(ts) AS tv
      FROM events WHERE event_type = 'view'
    ),
    cand AS (
      SELECT c.click_id, c.user_id, v.view_id,
             abs(c.tc - v.tv) AS gap_us, v.tv, c.tc,
             row_number() OVER (
               PARTITION BY c.click_id
               ORDER BY abs(c.tc - v.tv), v.tv, v.view_id
             ) AS rnk
      FROM c JOIN v ON c.user_id = v.user_id
      WHERE abs(c.tc - v.tv) <= {NEAREST_GAP_US}
    )
    SELECT c.click_id, c.user_id, b.view_id,
           b.gap_us,
           CASE WHEN b.view_id IS NULL THEN NULL
                WHEN b.tv < b.tc THEN 'before'
                WHEN b.tv > b.tc THEN 'after'
                ELSE 'exact' END AS direction
    FROM c LEFT JOIN (SELECT * FROM cand WHERE rnk = 1) b
      ON c.click_id = b.click_id
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: each click pairs with the closest same-user
    view in EITHER time direction within a 1-hour gap — the variant
    the backward-only as-of (q_join_asof) cannot express, needed when
    the reference signal may land just after the event (sensor
    alignment, log-clock slop). Ties at equal distance prefer the
    EARLIER view, then the smaller view_id; clicks with no view inside
    the gap survive with NULLs (left semantics).

    Scale shape: the oracle's per-user theta join is quadratic in the
    per-user row counts, so the engine plan BUCKET-BLOCKS time instead
    (the q_join_theta recipe): clicks fan out to their gap-width
    bucket +-1, the join is an EQUI-join on (user_id, bucket), and the
    exact |gap| predicate filters candidates — pair count is bounded
    by real temporal neighbors, never by the user's full history. One
    keyed exchange per side, one row_number per click over its
    candidates.

    Exactness: gaps are exact integer microseconds (epoch_us on both
    engines), so ordering, the gap cutoff, and the before/after/exact
    label are all integer decisions."""
    ev = t(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("tc"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.unix_micros(F.col("ts")).alias("tv"),
        F.expr(f"unix_micros(ts) DIV {NEAREST_GAP_US}").alias("vb"),
    )
    fanout = c.select(
        "click_id",
        "user_id",
        "tc",
        F.explode(
            F.array(
                *[
                    F.expr(f"tc DIV {NEAREST_GAP_US}") + F.lit(o)
                    for o in (-1, 0, 1)
                ]
            )
        ).alias("cb"),
    )
    cand = (
        fanout.join(
            v,
            (F.col("user_id") == F.col("v_user")) & (F.col("cb") == F.col("vb")),
        )
        .filter(F.abs(F.col("tc") - F.col("tv")) <= NEAREST_GAP_US)
        .select(
            "click_id",
            "view_id",
            F.abs(F.col("tc") - F.col("tv")).alias("gap_us"),
            "tv",
        )
        # the click's 3 fanout buckets are distinct, so each (click,
        # view) pair joins at most once; the rank picks the winner
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("click_id").orderBy(
                    "gap_us", F.asc("tv"), F.asc("view_id")
                )
            ),
        )
        .filter(F.col("rnk") == 1)
    )
    return c.join(cand, "click_id", "left").select(
        "click_id",
        "user_id",
        "view_id",
        "gap_us",
        F.when(F.col("view_id").isNull(), F.lit(None).cast("string"))
        .when(F.col("tv") < F.col("tc"), "before")
        .when(F.col("tv") > F.col("tc"), "after")
        .otherwise("exact")
        .alias("direction"),
    )


NULLSAFE_SENTINEL = "3-MEDIUM"  # priority mapped to NULL on both sides


@query(
    "q_join_null_safe",
    f"""
    WITH o AS (
      SELECT nullif(o_orderpriority, '{NULLSAFE_SENTINEL}') AS pr,
             {sql_cents("o_totalprice")} AS price_c
      FROM orders
    ),
    d AS (
      SELECT DISTINCT nullif(o_orderpriority, '{NULLSAFE_SENTINEL}') AS pr
      FROM orders
    )
    SELECT d.pr AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(o.price_c) AS BIGINT) AS price_cents
    FROM d JOIN o ON o.pr IS NOT DISTINCT FROM d.pr
    GROUP BY d.pr
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): ordinary
    equality drops every NULL-keyed row on the floor silently — the
    classic lost-rows bug when dimension keys are nullable. The
    fixture has no NULL keys, so one priority is deterministically
    mapped to NULL on BOTH sides (nullif) and the join must still
    carry that bucket through: a plain `=` join would lose ~1/5 of
    the orders and fail the count/sum hash.

    Planner note: eqNullSafe compiles to a hash-joinable key (Spark
    wraps it as a knownfloatingpointnormalized coalesce pair), so this
    stays a broadcast hash join, NOT a nested loop — nullable keys
    don't cost the join strategy.

    Scale shape: distinct-priority build side is bounded (broadcast);
    one fact scan, one keyed aggregate."""
    o = t(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_orderpriority"), F.lit(NULLSAFE_SENTINEL)).alias("pr"),
        cents(F.col("o_totalprice")).alias("price_c"),
    )
    d = (
        t(spark, sf_dir, "orders")
        .select(
            F.nullif(F.col("o_orderpriority"), F.lit(NULLSAFE_SENTINEL)).alias(
                "pr"
            )
        )
        .distinct()
    )
    return (
        o.join(F.broadcast(d).alias("d"), o["pr"].eqNullSafe(F.col("d.pr")))
        .groupBy(F.col("d.pr").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_c").cast("long").alias("price_cents"),
        )
    )
