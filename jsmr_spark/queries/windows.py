"""Window functions (SURVEY.md §2.B "Window functions").

Reference parity: JsMr expresses any per-key ordered computation as a
reduce over the key's full value list (SURVEY.md §2.A A6) — ranking,
running totals and lag/lead all require the user to sort inside
reduce(). Here they are WindowExec: one hash exchange on the partition
key, one in-partition sort, streaming frame evaluation — no per-key
materialization of value lists.

Every ORDER BY carries a unique tiebreak column (SURVEY.md §7.1.6) so
rank/lag results are deterministic, and every frame is written out
explicitly because engines disagree on default frames.

Scale notes: all windows partition by a high-cardinality key
(customer, user) — state per partition is one customer's orders, never
global. The only global window (q_topk's rank) runs AFTER a limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.compat import cents, r4, sql_cents
from jsmr_spark.queries.common import t
from jsmr_spark.registry import query

_O_PRICE_C = sql_cents("o_totalprice")


@query(
    "q_win_rank",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per customer."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q_win_percent",
    """
    SELECT o_orderkey, o_custkey,
           round(percent_rank() OVER w, 4) AS pct_rnk,
           round(cume_dist() OVER w, 4) AS cume,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile (ratios of small ints — both
    engines divide the same exact integers)."""
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 4).alias("pct_rnk"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "q_win_lag_lead",
    """
    SELECT event_id, user_id, ts,
           lag(event_type, 1, 'none') OVER w AS prev_type,
           lead(event_type, 1, 'none') OVER w AS next_type,
           lag(event_id, 2) OVER w AS prev2_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead with defaults over per-user event timelines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type", 1, "none").over(w).alias("prev_type"),
        F.lead("event_type", 1, "none").over(w).alias("next_type"),
        F.lag("event_id", 2).over(w).alias("prev2_id"),
    )


@query(
    "q_win_running",
    f"""
    SELECT o_orderkey, o_custkey, o_orderdate,
           sum({_O_PRICE_C}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / 100.0::DOUBLE AS running_spend,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_orders
    FROM orders
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals (exact cents sums — identical in any accumulation
    order)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = t(spark, sf_dir, "orders").withColumn("price_c", cents(F.col("o_totalprice")))
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.sum("price_c").over(w) / 100.0).alias("running_spend"),
        F.count(F.lit(1)).over(w).cast("long").alias("running_orders"),
    )


@query(
    "q_win_moving",
    f"""
    SELECT o_orderkey, o_custkey, o_orderdate,
           sum({_O_PRICE_C}) OVER w / (100.0::DOUBLE * count(*) OVER w) AS moving_avg_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average, computed as exact-cents sum / count so the
    engines cannot drift."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    df = t(spark, sf_dir, "orders").withColumn("price_c", cents(F.col("o_totalprice")))
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.sum("price_c").over(w) / (100.0 * F.count(F.lit(1)).over(w))).alias("moving_avg_price"),
    )


@query(
    "q_win_range_frame",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(count(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                               RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_10,
           CAST(sum(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                               RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS BIGINT) AS qty_within_10
    FROM lineitem
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering column — peers included by
    value, so no tiebreak is needed for determinism."""
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.col("l_quantity"))
        .rangeBetween(-10, Window.currentRow)
    )
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.count(F.lit(1)).over(w).cast("long").alias("n_within_10"),
        F.sum(F.col("l_quantity").cast("long")).over(w).alias("qty_within_10"),
    )


@query(
    "q_win_first_last",
    """
    SELECT event_id, user_id, ts,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type,
           CAST(count(*) OVER w AS BIGINT) AS n_user_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with an explicit full-partition frame
    (default frames differ across engines — SURVEY.md §2.B)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_user_events"),
    )


@query(
    "q_win_topk_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders) x
    WHERE rnk <= 3
    """,
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the grouped top-k pattern (rank +
    filter). At scale this is the shuffle-once alternative to a
    self-join top-k."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "q_win_ntile",
    f"""
    WITH q AS (
      SELECT event_type, {sql_cents("value")} AS vc,
             ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile
      FROM events
    )
    SELECT event_type, quartile,
           count(*) AS n_events,
           min(vc) AS min_cents,
           max(vc) AS max_cents
    FROM q GROUP BY event_type, quartile
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartile assignment per event_type, summarized per bucket.

    ntile's distribution rule (first n%k buckets get one extra row) is
    SQL-standard and identical on both engines, and the ORDER BY
    carries the event_id tiebreak so equal values land in the same
    bucket everywhere. One keyed exchange + in-partition sort, then a
    map-side-combined summary aggregate."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    q = t(spark, sf_dir, "events").select(
        "event_type",
        cents(F.col("value")).alias("vc"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return q.groupBy("event_type", "quartile").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("vc").alias("min_cents"),
        F.max("vc").alias("max_cents"),
    )


@query(
    "q_win_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
      FROM days
    ),
    runs AS (
      SELECT user_id, anchor, count(*) AS len
      FROM isl GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS active_days,
           count(*) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY user_id
    """,
)
def q_win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity streaks — the gaps-and-islands pattern: per user,
    collapse events to distinct active days, anchor each run of
    CONSECUTIVE days by `day - row_number` (constant within a run,
    shifts at every gap), and report active days / streak count /
    longest streak. The retention sibling of q_retention_cohort: DAU
    tells you who showed up, streaks tell you who kept showing up.

    Everything is exact date/integer arithmetic with a deterministic
    per-user ordering (days are distinct, so no tie-break is needed).

    Scale shape: one distinct (user, day) rollup (map-side combined),
    one per-user window over the user's DAY list (bounded by the
    calendar, not by event volume), two keyed aggregates. The event
    table itself never sorts."""
    days = (
        t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    runs = isl.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )


@query(
    "q_win_cume_dist",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           round(cume_dist() OVER w, 4) AS cd,
           CAST(count(*) OVER w2 AS BIGINT) AS n_at_or_below,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_part
    FROM orders
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist per customer — the empirical-CDF window function that
    rounds out the ranking family (row_number/rank/dense_rank in
    q_win_rank, percent_rank/ntile elsewhere): for each order, the
    fraction of the customer's orders priced at or below it. The exact
    integer numerator/denominator (running count over an explicit ROWS
    frame, partition count) are emitted alongside so the hash check
    pins the exact rationals, with the double kept to one final
    division rounded identically on both engines.

    Scale shape: identical to every other window key — one exchange on
    the high-cardinality customer key, one in-partition sort, streaming
    frame evaluation; per-partition state is one customer's orders."""
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy("o_custkey")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        r4(F.cume_dist().over(w)).alias("cd"),
        F.count(F.lit(1)).over(w2).cast("long").alias("n_at_or_below"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n_part"),
    )


SESSION_GAP_S = 1800  # 30-minute inactivity gap closes a session


_SESSIONIZE_ORACLE = f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id FROM events
    ),
    l AS (
      SELECT user_id, us, event_id,
             CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > {SESSION_GAP_S * 1_000_000}
                  THEN 1 ELSE 0 END AS brk
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT user_id, us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM l
    ),
    g AS (
      SELECT user_id, sid,
             CAST(count(*) AS BIGINT) AS n_ev,
             CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS dur_s
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(max(n_ev) AS BIGINT) AS max_session_events,
           CAST(sum(dur_s) AS BIGINT) AS total_duration_s
    FROM g GROUP BY user_id
"""


@query("q_win_sessionize", _SESSIONIZE_ORACLE)
def q_win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-sessionization — the classic lag → break-flag →
    running-sum window pattern: a new session starts where a user's
    inter-event gap exceeds {SESSION_GAP_S} s, the session id is the
    running count of breaks, and the key reports per-user session
    stats (count, largest session, total active seconds). The batch
    twin of q_stream_session's session window: the streaming form
    closes sessions by watermark, this form derives identical
    boundaries declaratively over history — the backfill/replay path
    of the same product metric.

    Determinism: event ordering is the exact (epoch-µs, event_id)
    total order on both engines; gaps and durations are integer
    microseconds with one floor division to seconds.

    Scale shape: ONE exchange on user_id serves both window passes and
    the two aggregates that follow (same-key partitioning reused);
    per-partition state is one user's ordered events. No global sort,
    no driver state."""
    us = F.expr("unix_micros(ts)")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = t(spark, sf_dir, "events").select("user_id", us.alias("us"), "event_id")
    brk = (
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > SESSION_GAP_S * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("brk")
    )
    s = e.select("user_id", "us", "event_id", brk).select(
        "user_id", "us", F.sum("brk").over(wrun).alias("sid")
    )
    g = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.expr("CAST((max(us) - min(us)) DIV 1000000 AS BIGINT)").alias("dur_s"),
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.max("n_ev").cast("long").alias("max_session_events"),
        F.sum("dur_s").cast("long").alias("total_duration_s"),
    )
