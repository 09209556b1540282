"""Runtime-filter join: bloom-filter prefilter + exact recheck.

The 100 TB pattern this key exists to demonstrate: when a selective
dimension predicate drives a fact-table join, shipping the full fact
table into the join shuffle wastes almost all of the I/O. The scalable
plan builds a compact bit sketch of the qualifying build-side keys (a
few KB), broadcasts it into the fact scan as a cheap pre-filter, and
only the surviving ~few-percent of rows reach the exact join. Spark's
own runtime row-group filtering does the same thing internally; this
key implements it explicitly so the mechanism is visible, measurable,
and testable.

Correctness is NOT approximate: the bloom pass can only let false
positives through (never false negatives), and an exact broadcast
semi-join removes those — so the final result equals the plain
semi-join byte for byte, which is exactly what the oracle checks. The
bloom's internal hash (xxhash64) therefore never needs cross-engine
portability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jsmr_spark.compat import cents, sql_cents
from jsmr_spark.queries.common import t
from jsmr_spark.registry import query

BLOOM_BITS = 1 << 15  # 32768 bits = 512 longs ≈ 4 KB broadcast
BLOOM_WORDS = BLOOM_BITS // 64
SEGMENT = "BUILDING"


def _bit(col: Column, salt: str | None) -> Column:
    h = F.xxhash64(col) if salt is None else F.xxhash64(col, F.lit(salt))
    return F.pmod(h, F.lit(BLOOM_BITS))


@query(
    "q_join_bloom",
    f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           count(*) AS n_orders,
           CAST(sum({sql_cents("o_totalprice")}) AS BIGINT) AS sum_cents
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = '{SEGMENT}'
    )
    GROUP BY 1
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order volume for one market segment, computed through an
    explicit bloom runtime filter: build a 4 KB two-hash bitmap over the
    qualifying customer keys, prefilter the orders scan against it, and
    exact-semi-join only the survivors.

    The bitmap is assembled distributed (per-word bit_or aggregate) and
    only the <=512 (word, bits) rows land on the driver — the same
    tiny-sketch collect the IVF centroid path uses. At a 2943-key build
    side the filter passes ~ (1-e^(-2n/m))^2 ≈ 3% false positives,
    which the broadcast semi-join then removes; the result is exactly
    the plain semi-join, and the oracle pins that.

    Shape at 100 TB: the fact table never shuffles — it is scanned,
    bit-tested against a broadcast literal, and the few survivors meet
    the broadcast dimension. Build cost is one narrow pass over the
    dimension plus a 512-row aggregate."""
    keys = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == SEGMENT)
        .select("c_custkey")
    )
    # Distributed bitmap build: two bit positions per key, OR-folded
    # into 64-bit words. Collecting <=512 rows is sketch-sized state.
    bits = keys.select(
        F.explode(
            F.array(_bit(F.col("c_custkey"), None), _bit(F.col("c_custkey"), "s2"))
        ).alias("bit")
    )
    words = (
        bits.select(
            (F.col("bit") / 64).cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    vec = [0] * BLOOM_WORDS
    for row in words.collect():
        vec[row["word"]] = row["bits"]
    bloom = F.array(*[F.lit(v) for v in vec])

    orders = (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .withColumn("b1", _bit(F.col("o_custkey"), None))
        .withColumn("b2", _bit(F.col("o_custkey"), "s2"))
    )

    def test(bit: str) -> Column:
        word = (F.col(bit) / 64).cast("int")
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({bit} % 64 AS INT))")
        return F.element_at(bloom, word + 1).bitwiseAND(mask) != 0

    candidates = orders.where(test("b1") & test("b2")).drop("b1", "b2")
    exact = candidates.join(
        F.broadcast(keys), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    return (
        exact.select(
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            cents(F.col("o_totalprice")).alias("pc"),
        )
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("pc").alias("sum_cents"))
    )


_NAAJ_SQL = """
    WITH probe AS (
      SELECT o_orderkey, nullif(o_custkey % 100, 50) AS pk, {pc} AS cents
      FROM orders
    ),
    excl AS (
      -- residues bounded to 0..59 so classes 60..99 can NEVER be
      -- excluded: the kept/excluded-by-match/excluded-as-NULL
      -- three-way partition stays nontrivial at EVERY scale factor
      -- (ADVICE r4: unbounded residues saturate all 100 classes at
      -- larger sf and n_kept collapses to 0)
      SELECT c_custkey % 100 AS xk FROM customer
      WHERE c_acctbal < 0 AND c_custkey % 100 < 60
    )
    SELECT count(*) AS n_kept,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           (SELECT CAST(count(*) AS BIGINT) FROM probe WHERE pk IS NULL)
             AS n_null_probes
    FROM probe WHERE pk NOT IN (SELECT xk FROM excl)
"""


@query(
    "q_join_null_aware",
    _NAAJ_SQL.format(pc=sql_cents("o_totalprice")),
)
def q_join_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-aware NOT IN anti-join — the three-valued-logic operator a
    plain anti-join gets WRONG: a NULL probe key can never satisfy
    NOT IN (x <> NULL is unknown), and one NULL in the subquery would
    empty the whole result. The probe side here carries real NULLs
    (nullif residue), so an implementation that silently rewrites
    NOT IN to left-anti keeps ~1/100 extra rows and fails the hash
    (the residue is chosen to produce NULL probes at every fixture
    scale, sf0.001 included).

    Spark plans this as a null-aware broadcast anti-join — the
    physical node prints as `BroadcastHashJoin [...] LeftAnti,
    BuildRight, true`, the trailing flag being isNullAwareAntiJoin; a
    broadcast-only strategy precisely because general null-aware anti
    semantics do not decompose into a keyed shuffle without handling
    the NULL-matches-everything row asymmetrically. The identical SQL
    runs on both engines, and the n_null_probes column pins the
    excluded NULL count so the semantics difference is visible in the
    output, not just implied.

    Shape at 100 TB: the exclusion side is an aggregated dim (here
    negative-balance residues) — broadcast-sized by construction. A
    fact-sized NOT IN subquery is an anti-pattern at any scale; the
    rewrite is NOT EXISTS (null-safe predicate made explicit), which
    shuffles as a plain anti-join."""
    from jsmr_spark.queries.common import sql as run_sql

    return run_sql(spark, sf_dir, _NAAJ_SQL.format(pc=sql_cents("o_totalprice")))
