"""Skew-mitigation techniques as first-class, oracle-checked operators.

Hot keys are the failure mode of keyed shuffles at 100 TB: one
executor receives the whole key's data while the rest idle. AQE's
skew-join splitting handles the common case automatically (enabled in
session.py); these keys demonstrate the EXPLICIT forms — salted
replicated join and two-phase salted aggregation — wired so the final
result is provably identical to the unsalted plan (the oracle runs the
plain SQL).

Salts are a deterministic hash of the row key, not rand() — reruns
stay bit-identical. Unlike the dedup pipeline the salt does NOT need
to be cross-engine portable: the final result is salt-invariant (the
oracle runs the plain unsalted SQL), so the cheap engine-native
xxhash64 is the right choice over the md5-derived portable hash
(~2 microseconds/row saved on every probe-side row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.compat import cents, sql_cents
from jsmr_spark.queries.common import t
from jsmr_spark.registry import query

SALT_K = 8


def _salt(col: str) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(SALT_K)).cast("int")


@query(
    "q_join_skew_salted",
    f"""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           CAST(sum({sql_cents("o.o_totalprice")}) AS BIGINT) AS total_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join: the build side (customer) is replicated
    SALT_K times with salt 0..K-1, the probe side (orders) gets a
    deterministic salt from its row key, and the join runs on
    (custkey, salt) — a hot customer's orders now spread over K
    reducers instead of one. Result is identical to the plain join
    (every probe row still meets exactly one build replica), which the
    unsalted oracle SQL proves. This is the manual form of what AQE
    skew-join does adaptively; use it when skew is known at plan time
    (power-law user activity) or the engine lacks runtime stats."""
    # Replicate via explode(sequence(...)): a narrow per-row fan-out,
    # no nested-loop join operator in the plan at all.
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.expr(f"sequence(0, {SALT_K - 1})")).alias("salt"),
    )
    o = t(spark, sf_dir, "orders").withColumn("salt", _salt("o_orderkey"))
    return (
        o.join(c, (o["o_custkey"] == c["c_custkey"]) & (o["salt"] == c["salt"]))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).alias("total_cents"),
        )
    )


@query(
    "q_agg_skew_salted",
    f"""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum({sql_cents("o_totalprice")}) AS BIGINT) AS total_cents,
           count(DISTINCT o_custkey) AS n_custs
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (= maximally
    skewed) key: phase 1 aggregates by (key, salt) so every reducer
    holds 1/K of each hot group, phase 2 merges the K partials per key.
    count/sum re-merge exactly; the distinct-count keeps its key-salted
    spread through phase 1 by carrying the distinct SET per salt
    (the heavy dedup work happens key-salted) and merging the K small
    partial sets in phase 2 with flatten + array_distinct. One linear
    aggregation chain — no diamond, so nothing is recomputed and no
    checkpoint is needed. Spark's partial aggregation already does this
    per-PARTITION; explicit salting is the cluster-level form that also
    survives a partitioner that hashes whole keys to one reducer."""
    o = t(spark, sf_dir, "orders").withColumn("salt", _salt("o_orderkey"))
    phase1 = o.groupBy("o_orderstatus", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(cents(F.col("o_totalprice"))).alias("pcents"),
        F.collect_set("o_custkey").alias("pcusts"),
    )
    # Same custkey can appear under several salts (salt comes from the
    # orderkey), so the phase-2 merge dedups across the K partial sets.
    return phase1.groupBy("o_orderstatus").agg(
        F.sum("pn").alias("n"),
        F.sum("pcents").cast("long").alias("total_cents"),
        F.size(F.array_distinct(F.flatten(F.collect_list("pcusts")))).cast(
            "long"
        ).alias("n_custs"),
    )


SKEW_TOP = 10


@query(
    "q_skew_report",
    f"""
    WITH k AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
             max(n) AS max_n,
             CAST(round(median(n), 0) AS BIGINT) AS med_n
      FROM k
    ),
    top AS (
      SELECT user_id, n,
             row_number() OVER (ORDER BY n DESC, user_id) AS rnk
      FROM k
    )
    SELECT t.rnk, t.user_id, t.n AS n_rows_key,
           CAST(t.n * 1000000 // o.n_rows AS BIGINT) AS share_ppm,
           CAST(t.n * 10 // o.med_n AS BIGINT) AS x10_vs_median,
           o.n_keys, o.n_rows
    FROM top t, tot o
    WHERE t.rnk <= {SKEW_TOP}
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: the report you run BEFORE deciding
    whether a keyed join/agg needs the salting in this module or AQE's
    skew split. Per heavy key: row count, parts-per-million share of
    the table, and a 10x-scaled ratio to the median key — all exact
    integers (share and ratio via BIGINT floor division, the median of
    integer counts rounded to BIGINT), so the driver hashes the full
    diagnosis.

    Scale shape: one map-side-combined count per key (the exchange
    moves one row per key per partition), a TakeOrdered top-10 over
    the per-key counts, and a 1-row global aggregate broadcast onto
    the 10 survivors. The per-key count table is exactly the histogram
    AQE consults internally — this surfaces it as data. Exact medians
    over the key histogram sort ~n_keys rows, bounded by key
    cardinality, not table size."""
    k = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.round(F.percentile("n", F.lit(0.5)), 0).cast("long").alias("med_n"),
    )
    top = (
        k.orderBy(F.desc("n"), F.asc("user_id"))
        .limit(SKEW_TOP)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("n"), F.asc("user_id"))),
        )
    )
    return top.crossJoin(F.broadcast(tot)).select(
        "rnk",
        "user_id",
        F.col("n").alias("n_rows_key"),
        F.expr("CAST(n * 1000000 AS BIGINT) DIV n_rows").alias("share_ppm"),
        F.expr("CAST(n * 10 AS BIGINT) DIV med_n").alias("x10_vs_median"),
        "n_keys",
        "n_rows",
    )
