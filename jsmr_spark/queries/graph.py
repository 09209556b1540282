"""Graph analytics over relational data: weighted PageRank.

Connected components (the other classic iterative graph op) already
ships in pipeline.py as the dedup-cluster CC loop; this module adds the
power-iteration family. Both follow the same Pregel-on-DataFrames
shape: vertices and edges are plain DataFrames partitioned by key, and
one iteration = join(edges, ranks) -> per-destination aggregate — a
bounded, fixed number of keyed shuffles, no driver-side state.

Cross-engine exactness: PageRank is normally float arithmetic, and
float sum order differs between engines. Every quantity here is an
exact scaled INTEGER instead — ranks carry PR_SCALE units, per-edge
contributions use integer division, and the damping update is
(15*base + 85*in_sum) div 100 — so both engines compute bit-identical
BIGINTs and the hash check is exact, iteration after iteration. The
truncation this introduces is < 1 unit in 1e9 per edge per iteration:
far below any ranking-relevant difference, and identically applied on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsmr_spark.queries.common import t
from jsmr_spark.registry import query

PR_SCALE = 1_000_000_000  # rank unit: 1e9 (sum of all ranks ~= PR_SCALE)
PR_ITERS = 3
PR_DAMP_PCT = 85  # damping factor in percent


_PAGERANK_ORACLE = f"""
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM nodes),
    pr0 AS (
      SELECT node, {PR_SCALE} // (SELECT n FROM nn) AS pr FROM nodes
    ),
    it1 AS (
      SELECT nodes.node,
             ({100 - PR_DAMP_PCT} * ({PR_SCALE} // (SELECT n FROM nn))
              + {PR_DAMP_PCT} * coalesce(sum(pr0.pr * e.w // outw.ow), 0)) // 100 AS pr
      FROM nodes
      LEFT JOIN edges e ON e.dst = nodes.node
      LEFT JOIN outw ON outw.src = e.src
      LEFT JOIN pr0 ON pr0.node = e.src
      GROUP BY nodes.node
    ),
    it2 AS (
      SELECT nodes.node,
             ({100 - PR_DAMP_PCT} * ({PR_SCALE} // (SELECT n FROM nn))
              + {PR_DAMP_PCT} * coalesce(sum(it1.pr * e.w // outw.ow), 0)) // 100 AS pr
      FROM nodes
      LEFT JOIN edges e ON e.dst = nodes.node
      LEFT JOIN outw ON outw.src = e.src
      LEFT JOIN it1 ON it1.node = e.src
      GROUP BY nodes.node
    ),
    it3 AS (
      SELECT nodes.node,
             ({100 - PR_DAMP_PCT} * ({PR_SCALE} // (SELECT n FROM nn))
              + {PR_DAMP_PCT} * coalesce(sum(it2.pr * e.w // outw.ow), 0)) // 100 AS pr
      FROM nodes
      LEFT JOIN edges e ON e.dst = nodes.node
      LEFT JOIN outw ON outw.src = e.src
      LEFT JOIN it2 ON it2.node = e.src
      GROUP BY nodes.node
    )
    SELECT n.n_name, it3.pr AS pr_scaled,
           CAST(row_number() OVER (ORDER BY it3.pr DESC, n.n_name) AS INTEGER) AS rnk
    FROM it3 JOIN nation n ON n.n_nationkey = it3.node
"""


@query("q_graph_pagerank", _PAGERANK_ORACLE)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph ({PR_ITERS} power
    iterations, damping {PR_DAMP_PCT}%): edges are customer-nation ->
    supplier-nation weighted by lineitem count; the rank answers "which
    nation's suppliers absorb the most order flow, transitively".

    Exactness: all arithmetic is scaled-integer (module docstring) —
    the hash check is exact across engines, no float sum-order drift.
    Dangling nodes (no out-edges) simply do not contribute, the
    standard simplification; nodes with no in-edges settle at the
    (1-d)/N base via the LEFT join + coalesce(0).

    Shape at 100 TB: the edge build is the usual fact-fact + broadcast
    pattern (orders⨝lineitem shuffle on orderkey, then custkey/suppkey
    lookups); each PageRank iteration is ONE keyed equi-join
    (ranks ⨝ edges on src — both sides hash-partitioned on the same
    key, so Catalyst reuses the exchange across iterations) plus ONE
    per-dst aggregate. Driver holds nothing; iteration count is fixed,
    so the lineage stays bounded (at production iteration counts you
    checkpoint every ~10 rounds — noted, not needed for {PR_ITERS})."""
    l = t(spark, sf_dir, "lineitem").alias("l")
    o = t(spark, sf_dir, "orders").alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    s = t(spark, sf_dir, "supplier").alias("s")
    nation = t(spark, sf_dir, "nation")

    edges = (
        l.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"))
        .join(s, F.col("l.l_suppkey") == F.col("s.s_suppkey"))
        .groupBy(
            F.col("c.c_nationkey").alias("src"),
            F.col("s.s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    n_nodes = nodes.count()  # node-set cardinality: tiny, known up front
    base = PR_SCALE // n_nodes

    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # Pre-join the per-edge transition weight once; iterations reuse it.
    trans = edges.join(outw, "src").select("src", "dst", "w", "ow")

    pr = nodes.select("node", F.lit(base).cast("long").alias("pr"))
    for _ in range(PR_ITERS):
        contrib = (
            trans.join(pr, trans["src"] == pr["node"])
            .select(
                F.col("dst"),
                F.expr("pr * w div ow").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        pr = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit((100 - PR_DAMP_PCT) * base)
                    + F.lit(PR_DAMP_PCT) * F.coalesce(F.col("in_sum"), F.lit(0).cast("long"))
                ).alias("num"),
            )
            .select("node", F.expr("num div 100").alias("pr"))
        )

    ranked = pr.join(nation, nation["n_nationkey"] == pr["node"]).select(
        F.col("n_name"), F.col("pr").alias("pr_scaled")
    )
    from pyspark.sql import Window

    # limit-then-rank: the TakeOrdered bound (node-set-sized) keeps the
    # rank window off an unbounded global sort (plan-audit rule).
    keys = [F.desc("pr_scaled"), F.asc("n_name")]
    top = ranked.orderBy(*keys).limit(n_nodes)
    return top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(*keys)).cast("int")
    )
