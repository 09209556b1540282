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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.queries.common import t
from jsmr_spark.queries.sampling_geo import GEO_PTS_SQL, geo_edges_sql, geo_pairs
from jsmr_spark.registry import query

PR_SCALE = 1_000_000_000  # rank unit: 1e9 (sum of all ranks ~= PR_SCALE)
PR_ITERS = 3
PR_DAMP_PCT = 85  # damping factor in percent

# The recursion keys (reach/SSSP/label-prop) collect their edge list to
# the driver and iterate there — measured 4-7x faster than re-executing
# the edge build per recursion level, but ONLY valid while the edge
# source is a dimension-keyed aggregate. The fixtures' graph nodes are
# nation keys (25 nations -> <= 625 directed edges), so the bound is
# structural, not statistical. _collect_control_plane makes it
# load-bearing: the plan materializes at most bound+1 rows on the
# driver, and exceeding the bound fails loudly instead of OOMing.
CONTROL_PLANE_EDGE_BOUND = 25 * 25


def _collect_control_plane(df: DataFrame, what: str, bound: int = CONTROL_PLANE_EDGE_BOUND):
    """Collect a control-plane-sized relation with a hard row bound.

    ``limit(bound+1)`` keeps the driver transfer bounded even if the
    source grows; one extra row is enough to detect the overflow."""
    rows = df.limit(bound + 1).collect()
    if len(rows) > bound:
        raise RuntimeError(
            f"{what}: edge list exceeds the control-plane bound "
            f"({bound} rows) — the driver-side recursion is only valid "
            f"for dimension-keyed graphs. For a data-scale graph, use "
            f"the distributed alternatives: the LSH-bucketed CC loop "
            f"(q_dedup_clusters_lsh, pipeline.py) or a bounded-frontier "
            f"keyed-join iteration (pagerank pattern in this module)."
        )
    return rows


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
    SELECT n.n_name, CAST(it3.pr AS BIGINT) AS pr_scaled,
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


REACH_SRC = 0  # BFS source nation
REACH_MAX_HOPS = 3


def _reach_sql(int_div: str) -> str:
    """The BFS query, identical text on both engines apart from the
    integer-division spelling (`//` DuckDB, `div` Spark)."""
    del int_div  # no division needed; kept for signature symmetry
    return f"""
    WITH RECURSIVE
    ew AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ),
    srct AS (SELECT src, sum(w) AS tw, count(*) AS ne FROM ew GROUP BY src),
    edges AS (
      -- each source keeps only its OWN above-average edges: exact
      -- integer cross-multiplication, no float threshold, and every
      -- node retains out-edges at every scale factor (a global
      -- threshold left low-volume nations edgeless at sf0.001)
      SELECT ew.src, ew.dst FROM ew JOIN srct ON ew.src = srct.src
      WHERE ew.w * srct.ne > srct.tw
    ),
    r(node, hop) AS (
      SELECT CAST({REACH_SRC} AS INTEGER) AS node, 0 AS hop
      UNION ALL
      SELECT e.dst AS node, r.hop + 1 AS hop
      FROM r JOIN edges e ON e.src = r.node
      WHERE r.hop < {REACH_MAX_HOPS}
    )
    SELECT n.n_name, CAST(min(r.hop) AS INTEGER) AS dist
    FROM r JOIN nation n ON n.n_nationkey = r.node
    GROUP BY n.n_name
    """


_REACH_SPARK_RECURSION = f"""
    WITH RECURSIVE
    r(node, hop) AS (
      SELECT CAST({REACH_SRC} AS INTEGER) AS node, 0 AS hop
      UNION ALL
      SELECT e.dst AS node, r.hop + 1 AS hop
      FROM r JOIN reach_edges e ON e.src = r.node
      WHERE r.hop < {REACH_MAX_HOPS}
    )
    SELECT n.n_name, CAST(min(r.hop) AS INTEGER) AS dist
    FROM r JOIN nation n ON n.n_nationkey = r.node
    GROUP BY n.n_name
"""


@query("q_graph_reachability", _reach_sql("//"))
def q_graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS / transitive closure via WITH RECURSIVE (Spark 4.1
    recursive CTE support): hop distance from NATION_{REACH_SRC} to
    every nation reachable in <= {REACH_MAX_HOPS} hops over the
    STRONG-edge trade graph (each source keeps its own above-average
    edges — an exact integer cross-multiplied threshold, so the graph
    is identical on both engines at every scale factor).

    This is the declarative twin of the hand-rolled iterative loops
    (PageRank above, the CC loop in pipeline.py): the engine's
    recursive execution repeats the frontier⨝edges join until the hop
    bound empties the frontier, and min(hop) collapses multiple
    discovery paths — the UNION ALL + bound + aggregate form is the
    portable BFS (UNION-distinct recursion semantics differ more
    across engines than a bounded frontier does).

    Scale shape: the edge build is the PageRank fact chain; each
    recursion level is one keyed equi-join frontier⨝edges. The hop
    bound caps blowup on dense graphs; on node-count-scaled graphs the
    frontier dedup (min-agg) is the keyed shuffle that keeps level
    sizes linear in nodes."""
    from jsmr_spark.io import register_views

    l = t(spark, sf_dir, "lineitem").alias("l")
    o = t(spark, sf_dir, "orders").alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    sup = t(spark, sf_dir, "supplier").alias("s")
    ew = (
        l.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"))
        .join(sup, F.col("l.l_suppkey") == F.col("s.s_suppkey"))
        .groupBy(
            F.col("c.c_nationkey").alias("src"),
            F.col("s.s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    srct = ew.groupBy("src").agg(F.sum("w").alias("tw"), F.count(F.lit(1)).alias("ne"))
    edges = (
        ew.join(srct.withColumnRenamed("src", "s2"), F.col("src") == F.col("s2"))
        .filter(F.col("w") * F.col("ne") > F.col("tw"))
        .select("src", "dst")
    )
    # Materialize the edge set ONCE (bounded by nations^2 — a driver-
    # side local relation, same rationale as the similarity probe
    # inlining): Spark does not materialize non-recursive CTEs, so a
    # pure-SQL form re-executes the whole fact-chain edge build on
    # EVERY recursion level (measured 4.1x at the 10x probe). The
    # recursion then joins a LocalRelation per level.
    edge_rows = _collect_control_plane(edges, "q_graph_reach")
    spark.createDataFrame(edge_rows, "src int, dst int").createOrReplaceTempView(
        "reach_edges"
    )
    register_views(spark, sf_dir)
    return spark.sql(_REACH_SPARK_RECURSION)


# Denser radius than q_geo_gridjoin's 50 km: at the fixture densities
# a 50 km graph has edges but essentially no closed triangles (a 0-row
# result would make the hash check vacuous); 100 km yields 37 / 1228 /
# 300k triangles at sf0.001/0.01/0.1.
TRI_RADIUS = 100_000

@query(
    "q_graph_triangles",
    f"""
    WITH pts AS ({GEO_PTS_SQL}),
    e AS ({geo_edges_sql(TRI_RADIUS)}),
    tri AS (
      SELECT e1.user_a AS a, e1.user_b AS b, e2.user_b AS c
      FROM e e1
      JOIN e e2 ON e2.user_a = e1.user_b
      JOIN e e3 ON e3.user_a = e1.user_a AND e3.user_b = e2.user_b
    )
    SELECT user_id, count(*) AS n_triangles
    FROM (
      SELECT a AS user_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    GROUP BY user_id
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count over the spatial-proximity graph (edges
    = user pairs within GEO_RADIUS, from sampling_geo.geo_pairs).

    Standard distributed triangle enumeration over ORIENTED edges
    (a < b everywhere): wedges come from joining the edge list to
    itself on the middle vertex (b = a'), the closing edge (a, c) is
    verified with a second equi-join, and each triangle {a<b<c} is
    found exactly once — no division by 3, no symmetric-edge blowup.
    Per-node counts then explode the 3 corners and sum.

    Shape at 100 TB: two keyed equi-joins on vertex ids; the oriented
    edge list keeps every wedge unique so the join output is the wedge
    count, the quantity that actually bounds triangle work. (The
    classic refinement — orient by degree instead of id to cap hub
    wedges — is one extra degree join away and changes nothing
    downstream.) The edge list itself comes from the blocked spatial
    join, never an all-pairs product; the oracle builds the same
    edges the honest O(N^2) way and must agree."""
    return triangles_frame(spark, sf_dir)


def triangles_frame(
    spark: SparkSession, sf_dir: str, radius: int = TRI_RADIUS
) -> DataFrame:
    """Triangle-count frame at an explicit radius — the scale probe
    re-runs it with radius/sqrt(10) at 10x rows (constant expected
    neighbors per point) to separate the algorithm's scaling from the
    synthetic domain's densification; the registered key and oracle
    keep TRI_RADIUS."""
    # Materialize the edge list ONCE (localCheckpoint, same pattern as
    # the CC loop in pipeline.py): the three join aliases would
    # otherwise each re-execute the whole blocked spatial join — the
    # audited plan dropped from 46 exchanges to the two wedge joins.
    # Unlike reachability's nations^2 edge set this one scales with
    # the data, so it stays distributed (no driver collect).
    e = geo_pairs(spark, sf_dir, radius).select("user_a", "user_b").localCheckpoint()
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.user_b") == F.col("e2.user_a"))
        .join(
            e3,
            (F.col("e3.user_a") == F.col("e1.user_a"))
            & (F.col("e3.user_b") == F.col("e2.user_b")),
        )
        .select(
            F.col("e1.user_a").alias("a"),
            F.col("e1.user_b").alias("b"),
            F.col("e2.user_b").alias("c"),
        )
    )
    corners = (
        tri.select(F.col("a").alias("user_id"))
        .unionAll(tri.select(F.col("b").alias("user_id")))
        .unionAll(tri.select(F.col("c").alias("user_id")))
    )
    return corners.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_triangles"))


SSSP_SRC = 0  # source nation
SSSP_MAX_HOPS = 3
SSSP_COST_NUM = 1_000_000  # edge cost = NUM // weight (heavier trade = cheaper)


def _sssp_sql(int_div: str) -> str:
    """Weighted SSSP, identical text on both engines apart from the
    integer-division spelling (`//` DuckDB, `div` Spark)."""
    return f"""
    WITH RECURSIVE
    ew AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ),
    edges AS (
      SELECT src, dst, CAST({SSSP_COST_NUM} {int_div} w AS BIGINT) AS cost FROM ew
    ),
    p(node, dist, hop) AS (
      SELECT CAST({SSSP_SRC} AS INTEGER) AS node, CAST(0 AS BIGINT) AS dist, 0 AS hop
      UNION ALL
      SELECT e.dst AS node, p.dist + e.cost AS dist, p.hop + 1 AS hop
      FROM p JOIN edges e ON e.src = p.node
      WHERE p.hop < {SSSP_MAX_HOPS}
    )
    SELECT n.n_name, CAST(min(p.dist) AS BIGINT) AS dist
    FROM p JOIN nation n ON n.n_nationkey = p.node
    GROUP BY n.n_name
    """


_SSSP_SPARK_RECURSION = f"""
    WITH RECURSIVE
    p(node, dist, hop) AS (
      SELECT CAST({SSSP_SRC} AS INTEGER) AS node, CAST(0 AS BIGINT) AS dist, 0 AS hop
      UNION ALL
      SELECT e.dst AS node, p.dist + e.cost AS dist, p.hop + 1 AS hop
      FROM p JOIN sssp_edges e ON e.src = p.node
      WHERE p.hop < {SSSP_MAX_HOPS}
    )
    SELECT n.n_name, CAST(min(p.dist) AS BIGINT) AS dist
    FROM p JOIN nation n ON n.n_nationkey = p.node
    GROUP BY n.n_name
"""


@query("q_graph_sssp", _sssp_sql("//"))
def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest path (bounded Bellman-Ford via
    WITH RECURSIVE): min-cost route from NATION_0 to every nation
    within <= 3 hops over the FULL weighted trade graph — the min-plus
    semiring sibling of the BFS (q_graph_reachability, hop counts) and
    the sum-times PageRank (q_graph_pagerank, rank mass). Edge cost is
    the exact integer 1e6 // trade-volume, so heavy trade routes are
    cheap and every distance is a BIGINT both engines compute
    bit-identically — no float path sums.

    Same scale shape as the BFS: the edge build is the fact chain
    (keyed joins + aggregate), materialized ONCE as a local relation
    (bounded by nations^2) so recursion levels don't re-run it; each
    level is one keyed frontier join and the final min(dist) collapses
    path multiplicity. A node-count-scaled graph keeps levels linear
    via the same min-agg frontier dedup."""
    from jsmr_spark.io import register_views

    l = t(spark, sf_dir, "lineitem").alias("l")
    o = t(spark, sf_dir, "orders").alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    sup = t(spark, sf_dir, "supplier").alias("s")
    edges = (
        l.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"))
        .join(sup, F.col("l.l_suppkey") == F.col("s.s_suppkey"))
        .groupBy(
            F.col("c.c_nationkey").alias("src"),
            F.col("s.s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .select(
            "src", "dst", F.expr(f"CAST({SSSP_COST_NUM} div w AS BIGINT)").alias("cost")
        )
    )
    edge_rows = _collect_control_plane(edges, "q_graph_sssp")
    spark.createDataFrame(edge_rows, "src int, dst int, cost bigint").createOrReplaceTempView(
        "sssp_edges"
    )
    register_views(spark, sf_dir)
    return spark.sql(_SSSP_SPARK_RECURSION)


# --- k-core peeling (round 7) -------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 4  # unrolled peel rounds (bounded, like PR_ITERS)


def _kcore_oracle() -> str:
    rounds = []
    prev_edges = "sym"
    for r in range(1, KCORE_ROUNDS + 1):
        rounds.append(
            f"d{r} AS (SELECT u, CAST(count(*) AS BIGINT) AS deg"
            f" FROM {prev_edges} GROUP BY u),\n"
            f"    a{r} AS (SELECT u FROM d{r} WHERE deg >= {KCORE_K})"
        )
        if r < KCORE_ROUNDS:
            rounds.append(
                f"s{r} AS (SELECT s.u, s.v FROM {prev_edges} s"
                f" JOIN a{r} x ON x.u = s.u JOIN a{r} y ON y.u = s.v)"
            )
            prev_edges = f"s{r}"
    body = ",\n    ".join(rounds)
    return f"""
    WITH pts AS ({GEO_PTS_SQL}),
    e AS ({geo_edges_sql(TRI_RADIUS)}),
    sym AS (
      SELECT user_a AS u, user_b AS v FROM e
      UNION ALL
      SELECT user_b, user_a FROM e
    ),
    {body}
    SELECT d{KCORE_ROUNDS}.u AS user_id, d{KCORE_ROUNDS}.deg AS residual_degree
    FROM d{KCORE_ROUNDS}
    JOIN a{KCORE_ROUNDS} ON a{KCORE_ROUNDS}.u = d{KCORE_ROUNDS}.u
    """


@query("q_graph_kcore", _kcore_oracle())
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_ROUNDS}-round k-core peeling (k={KCORE_K}) over the
    spatial-proximity graph: each round drops every node whose degree
    within the surviving subgraph is < k, the standard decomposition
    for separating graph hubs/communities from the sparse fringe
    (Seidman 1983, "Network structure and minimum degree"). Output is
    the nodes alive after the last round with their residual degree —
    defined as the bounded-round peel (identical on both engines), the
    exact k-core when the peel has converged.

    Scale shape: one round = one degree aggregate keyed on the node +
    two semi-joins restricting the edge list to survivors — the same
    bounded-keyed-shuffles-per-iteration contract as q_graph_pagerank
    and the CC loop (no driver-side state; the edge list is
    localCheckpointed once so the rounds chain from a materialized
    frame instead of re-running the blocked spatial join per round).
    Degrees and the k test are exact integers — nothing to round."""
    return kcore_frame(spark, sf_dir)


def kcore_frame(
    spark: SparkSession, sf_dir: str, radius: int = TRI_RADIUS
) -> DataFrame:
    """q_graph_kcore body at an explicit radius — the scale probe's
    density-held control re-runs it at radius/sqrt(10) (see the
    q_graph_triangles control: the 10x staging densifies the fixed
    domain, so fixed-radius edge counts grow ~100x by construction)."""
    from jsmr_spark.queries.sampling_geo import geo_pairs

    e = geo_pairs(spark, sf_dir, radius).select("user_a", "user_b")
    sym = (
        e.select(F.col("user_a").alias("u"), F.col("user_b").alias("v"))
        .unionAll(e.select(F.col("user_b").alias("u"), F.col("user_a").alias("v")))
        .localCheckpoint()
    )
    edges = sym
    deg = None
    for r in range(KCORE_ROUNDS):
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
        alive = deg.where(F.col("deg") >= KCORE_K).select("u")
        if r < KCORE_ROUNDS - 1:
            edges = (
                edges.join(alive, "u")
                .join(alive.select(F.col("u").alias("v")), "v")
                .select("u", "v")
            )
    return (
        deg.where(F.col("deg") >= KCORE_K)
        .select(F.col("u").alias("user_id"), F.col("deg").alias("residual_degree"))
    )


_DEGREE_DIST_ORACLE = f"""
    WITH pts AS ({GEO_PTS_SQL}),
    e AS ({geo_edges_sql(TRI_RADIUS)}),
    ends AS (
      SELECT user_a AS u FROM e
      UNION ALL
      SELECT user_b FROM e
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM ends GROUP BY u),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg)
    SELECT deg AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(count(*) * 1000000 // (SELECT n FROM tot) AS BIGINT) AS share_ppm
    FROM deg GROUP BY deg
"""


@query("q_graph_degree_dist", _DEGREE_DIST_ORACLE)
def q_graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the spatial-proximity graph: how many
    nodes have each degree, with the node share in exact ppm — the
    first diagnostic run on any production graph (heavy tail => hub
    skew => the skew-join/salting levers elsewhere in this repo).
    Census is over nodes incident to >= 1 edge (isolated users never
    enter the edge list, identically on both engines).

    Scale shape: the edge build is the grid-blocked radius self-join
    (geo_pairs — candidates from the 3x3 cell neighborhood only, no
    all-pairs); the distribution itself is two keyed hash aggregates
    (node -> degree, degree -> count) plus a 1-row broadcast total.
    Everything downstream of the edge list is map-side combinable, and
    all outputs are exact integers."""
    e = geo_pairs(spark, sf_dir, TRI_RADIUS).select("user_a", "user_b")
    ends = e.select(F.col("user_a").alias("u")).unionAll(
        e.select(F.col("user_b").alias("u"))
    )
    deg = ends.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    tot = deg.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        deg.groupBy("deg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("deg").alias("degree"),
            "n_nodes",
            F.expr("CAST(n_nodes * 1000000 AS BIGINT) DIV n").alias("share_ppm"),
        )
    )


LP_ROUNDS = 3  # unrolled sync label-propagation rounds (bounded, like PR_ITERS)

_TRADE_EDGES_SQL = """
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
"""


def _lp_chain_sql() -> str:
    """The shared label-propagation CTE chain (edges -> sym -> nodes ->
    lp0..lp{LP_ROUNDS}) used by both q_graph_label_prop's oracle and
    q_graph_modularity's."""
    rounds = []
    prev = "lp0"
    for r in range(1, LP_ROUNDS + 1):
        rounds.append(
            f"c{r} AS (SELECT e.u AS node, p.lbl AS lbl,"
            f" CAST(sum(e.w) AS BIGINT) AS tw"
            f" FROM sym e JOIN {prev} p ON p.node = e.v GROUP BY 1, 2),\n"
            f"    b{r} AS (SELECT node, lbl FROM ("
            f"SELECT node, lbl, row_number() OVER ("
            f"PARTITION BY node ORDER BY tw DESC, lbl) AS rn FROM c{r}"
            f") WHERE rn = 1),\n"
            f"    lp{r} AS (SELECT n.node, coalesce(b{r}.lbl, n.node) AS lbl"
            f" FROM nodes n LEFT JOIN b{r} ON b{r}.node = n.node)"
        )
        prev = f"lp{r}"
    body = ",\n    ".join(rounds)
    return f"""edges0 AS ({_TRADE_EDGES_SQL}),
    sym AS MATERIALIZED (
      SELECT u, v, CAST(sum(w) AS BIGINT) AS w FROM (
        SELECT src AS u, dst AS v, w FROM edges0
        UNION ALL
        SELECT dst AS u, src AS v, w FROM edges0
      ) GROUP BY u, v
    ),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    lp0 AS (SELECT node, node AS lbl FROM nodes),
    {body}"""


def _label_prop_oracle() -> str:
    return f"""
    WITH {_lp_chain_sql()},
    sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
           FROM lp{LP_ROUNDS} GROUP BY lbl)
    SELECT nt.n_name, CAST(f.lbl AS BIGINT) AS community,
           sz.community_size
    FROM lp{LP_ROUNDS} f
    JOIN nation nt ON nt.n_nationkey = f.node
    JOIN sz ON sz.lbl = f.lbl
    """


@query("q_graph_label_prop", _label_prop_oracle())
def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{LP_ROUNDS}-round synchronous weighted label propagation over the
    nation trade graph (Raghavan et al. 2007, "Near linear time
    algorithm to detect community structures"): every node starts as
    its own community; each round it adopts the label carrying the
    largest total edge weight among its neighbors, tie-broken toward
    the smaller label so both engines pick identically. Self-loop
    trade (customer and supplier in the same nation) votes for the
    node's own label — the natural weighting here, applied identically
    on both sides.

    Determinism: edge weights and vote sums are exact BIGINTs; the
    argmax is a row_number with a total (tw DESC, lbl ASC) order, so
    rounds never diverge between engines — no float modularity, no
    random visit order (the sync variant trades LPA's usual oscillation
    risk for reproducibility; {LP_ROUNDS} bounded rounds, like
    q_graph_pagerank's power iterations).

    Scale shape: the distributed work is the fact-chain edge
    aggregation (keyed shuffles, map-side combined) that collapses the
    corpus to the ≤ nations² trade graph; that control-plane-sized
    edge set is then collected ONCE (q_graph_sssp's pattern at
    graph.py:456) and the {LP_ROUNDS} bounded rounds run as exact-
    integer driver arithmetic — at any corpus scale the graph stays 25
    nodes, so driver rounds replace ~4 shuffle stages per round plus a
    per-round restack of the fact-chain lineage that made Catalyst
    plan build 85-99 % of wall at sf0.1 (13.7 s wall / 0.15 s exec
    before; ~1.9 s warm after). A graph whose node set scaled with the
    corpus would instead keep the labels-⨝-edges rounds distributed
    with localCheckpoint between rounds."""
    edge_rows, node_ids = _trade_sym_collect(spark, sf_dir)
    lbl = _label_prop_assign(edge_rows, node_ids)
    sizes: dict[int, int] = {}
    for label in lbl.values():
        sizes[label] = sizes.get(label, 0) + 1
    labels = spark.createDataFrame(
        [(n, lbl[n], sizes[lbl[n]]) for n in node_ids],
        "node int, community long, community_size long",
    )
    nation = t(spark, sf_dir, "nation")
    return labels.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("node"), "n_name")),
        "node",
    ).select("n_name", "community", "community_size")


def _trade_sym_collect(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, int, int]], list[int]]:
    """Distributed fact-chain aggregation of the symmetric weighted
    nation trade graph, collected ONCE to the driver (bounded by
    nations² — control-plane-sized, the q_graph_sssp pattern at
    graph.py:456). Shared by q_graph_label_prop / q_graph_modularity:
    the heavy work (corpus → ≤625 aggregated edges) stays in keyed
    map-side-combined shuffles; only the tiny graph crosses to the
    driver."""
    l = t(spark, sf_dir, "lineitem").alias("l")
    o = t(spark, sf_dir, "orders").alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    s = t(spark, sf_dir, "supplier").alias("s")
    nation = t(spark, sf_dir, "nation")

    edges0 = (
        l.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"))
        .join(s, F.col("l.l_suppkey") == F.col("s.s_suppkey"))
        .groupBy(
            F.col("c.c_nationkey").alias("src"),
            F.col("s.s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    sym = (
        edges0.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w")
        .unionAll(
            edges0.select(F.col("dst").alias("u"), F.col("src").alias("v"), "w")
        )
        .groupBy("u", "v")
        .agg(F.sum("w").cast("long").alias("w"))
    )
    edge_rows = [
        (r["u"], r["v"], r["w"])
        for r in _collect_control_plane(sym, "label-prop edge build")
    ]
    node_ids = sorted(
        r["node"]
        for r in nation.select(F.col("n_nationkey").alias("node")).collect()
    )
    return edge_rows, node_ids


def _label_prop_assign(
    edge_rows: list[tuple[int, int, int]], node_ids: list[int]
) -> dict[int, int]:
    """The LP_ROUNDS synchronous label-propagation rounds as exact-
    integer driver arithmetic over the collected control-plane graph —
    tie-break is the same total (tw DESC, lbl ASC) order as the
    oracle's row_number."""
    lbl = {n: n for n in node_ids}
    for _ in range(LP_ROUNDS):
        votes: dict[tuple[int, int], int] = {}
        for u, v, w in edge_rows:
            k = (u, lbl[v])
            votes[k] = votes.get(k, 0) + w
        best: dict[int, tuple[int, int]] = {}
        for (u, label), tw in votes.items():
            cur = best.get(u)
            if cur is None or (-tw, label) < cur:
                best[u] = (-tw, label)
        lbl = {n: (best[n][1] if n in best else n) for n in node_ids}
    return lbl


LINK_MIN_CN = 2  # min common neighbors before a pair is scored
LINK_TOP = 3  # predictions reported per node

_LINK_ORACLE = f"""
    WITH pts AS ({GEO_PTS_SQL}),
    e AS ({geo_edges_sql(TRI_RADIUS)}),
    sym AS (
      SELECT user_a AS u, user_b AS v FROM e
      UNION ALL
      SELECT user_b, user_a FROM e
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u),
    cand AS (
      SELECT a.u AS u, b.v AS v, CAST(count(*) AS BIGINT) AS cn
      FROM sym a JOIN sym b ON a.v = b.u AND a.u < b.v
      GROUP BY a.u, b.v
    ),
    new_pairs AS (
      SELECT c.u, c.v, c.cn FROM cand c
      WHERE c.cn >= {LINK_MIN_CN}
        AND NOT EXISTS (SELECT 1 FROM sym s WHERE s.u = c.u AND s.v = c.v)
    ),
    scored AS (
      SELECT np.u, np.v, np.cn,
             CAST(np.cn * 1000 // (du.deg + dv.deg - np.cn) AS BIGINT)
               AS jaccard_milli
      FROM new_pairs np
      JOIN deg du ON du.u = np.u
      JOIN deg dv ON dv.u = np.v
    ),
    ranked AS (
      SELECT u, v, cn, jaccard_milli,
             CAST(row_number() OVER (PARTITION BY u
                  ORDER BY cn DESC, jaccard_milli DESC, v) AS INTEGER) AS rnk
      FROM scored
    )
    SELECT u AS user_id, rnk, v AS predicted_friend, cn AS common_neighbors,
           jaccard_milli
    FROM ranked WHERE rnk <= {LINK_TOP}
"""


@query("q_graph_link_predict", _LINK_ORACLE)
def q_graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the spatial-proximity
    graph (Liben-Nowell & Kleinberg 2003): candidate pairs are length-2
    paths (u—w—v, u < v) that are NOT already edges, scored by common-
    neighbor count and the Jaccard coefficient cn/(deg_u+deg_v−cn) in
    exact milli-units; top-{LINK_TOP} predictions per node with a
    total (cn DESC, jaccard DESC, v) order. The "people you may know"
    primitive that completes the graph family: structure (degree/core/
    triangles), ranking (PageRank), communities (label prop),
    reachability/SSSP — and now edge prediction.

    Scale shape: the length-2 path join is keyed on the shared
    neighbor w — work is Σ deg(w)², the triangle-counting budget, kept
    honest by the same grid-bounded edge build; the existing-edge
    exclusion is a left-anti join on the edge key; degrees broadcast.
    All counts and the Jaccard milli are exact BIGINTs."""
    return link_predict_frame(spark, sf_dir)


def link_predict_frame(
    spark: SparkSession, sf_dir: str, radius: int = TRI_RADIUS
) -> DataFrame:
    """q_graph_link_predict body at an explicit radius — the scale
    probe's density-held control re-runs it at radius/sqrt(10) (see
    triangles_frame / kcore_frame: the 10x staging densifies the fixed
    domain, so fixed-radius wedges grow ~1000x by construction)."""
    e = geo_pairs(spark, sf_dir, radius).select("user_a", "user_b")
    sym = (
        e.select(F.col("user_a").alias("u"), F.col("user_b").alias("v"))
        .unionAll(e.select(F.col("user_b").alias("u"), F.col("user_a").alias("v")))
        .localCheckpoint()
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    a = sym.select(F.col("u"), F.col("v").alias("w"))
    b = sym.select(F.col("u").alias("w"), F.col("v"))
    cand = (
        a.join(b, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
        .where(F.col("cn") >= LINK_MIN_CN)
    )
    new_pairs = cand.join(sym, ["u", "v"], "left_anti")
    scored = (
        new_pairs.join(
            F.broadcast(deg.select(F.col("u"), F.col("deg").alias("du"))), "u"
        )
        .join(
            F.broadcast(
                deg.select(F.col("u").alias("v"), F.col("deg").alias("dv"))
            ),
            "v",
        )
        .select(
            "u",
            "v",
            "cn",
            F.expr("CAST(cn * 1000 DIV (du + dv - cn) AS BIGINT)").alias(
                "jaccard_milli"
            ),
        )
    )
    wr = Window.partitionBy("u").orderBy(
        F.desc("cn"), F.desc("jaccard_milli"), F.asc("v")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .where(F.col("rnk") <= LINK_TOP)
        .select(
            F.col("u").alias("user_id"),
            "rnk",
            F.col("v").alias("predicted_friend"),
            F.col("cn").alias("common_neighbors"),
            "jaccard_milli",
        )
    )


CLOSE_HOPS = 3  # bounded BFS horizon (trade graph diameter is ~2)

_CLOSENESS_ORACLE = f"""
    WITH edges0 AS MATERIALIZED ({_TRADE_EDGES_SQL}),
    sym AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT src AS u, dst AS v FROM edges0
        UNION ALL
        SELECT dst AS u, src AS v FROM edges0
      ) WHERE u <> v
    ),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    d0 AS (SELECT node AS srcn, node AS dst FROM nodes),
    d1 AS MATERIALIZED (
      SELECT DISTINCT d0.srcn, e.v AS dst
      FROM d0 JOIN sym e ON e.u = d0.dst
      WHERE e.v <> d0.srcn
    ),
    d2 AS MATERIALIZED (
      SELECT DISTINCT d1.srcn, e.v AS dst
      FROM d1 JOIN sym e ON e.u = d1.dst
      WHERE NOT EXISTS (SELECT 1 FROM d1 p WHERE p.srcn = d1.srcn
                        AND p.dst = e.v)
        AND e.v <> d1.srcn
    ),
    d3 AS MATERIALIZED (
      SELECT DISTINCT d2.srcn, e.v AS dst
      FROM d2 JOIN sym e ON e.u = d2.dst
      WHERE NOT EXISTS (SELECT 1 FROM d1 p WHERE p.srcn = d2.srcn
                        AND p.dst = e.v)
        AND NOT EXISTS (SELECT 1 FROM d2 p WHERE p.srcn = d2.srcn
                        AND p.dst = e.v)
        AND e.v <> d2.srcn
    ),
    sums AS (
      SELECT n.node AS srcn,
             CAST(coalesce(c1.n, 0) + coalesce(c2.n, 0) + coalesce(c3.n, 0)
                  AS BIGINT) AS n_reached,
             CAST(coalesce(c1.n, 0) + 2 * coalesce(c2.n, 0)
                  + 3 * coalesce(c3.n, 0) AS BIGINT) AS dist_sum
      FROM nodes n
      LEFT JOIN (SELECT srcn, count(*) AS n FROM d1 GROUP BY srcn) c1
        ON c1.srcn = n.node
      LEFT JOIN (SELECT srcn, count(*) AS n FROM d2 GROUP BY srcn) c2
        ON c2.srcn = n.node
      LEFT JOIN (SELECT srcn, count(*) AS n FROM d3 GROUP BY srcn) c3
        ON c3.srcn = n.node
    )
    SELECT nt.n_name, s.n_reached, s.dist_sum,
           CAST(CASE WHEN s.dist_sum > 0
                THEN s.n_reached * 1000000 // s.dist_sum ELSE 0 END AS BIGINT)
             AS closeness_ppm
    FROM sums s JOIN nation nt ON nt.n_nationkey = s.srcn
"""


@query("q_graph_closeness", _CLOSENESS_ORACLE)
def q_graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness centrality over the nation trade graph within a
    {CLOSE_HOPS}-hop BFS horizon (Bavelas 1950, harmonically bounded):
    closeness = n_reached / Σ distances in exact ppm — which nation
    sits nearest to everyone through trade. The distance-based member
    of the centrality family next to PageRank (flow-based) and degree
    (local); the bounded horizon is the q_graph_reachability contract
    (and the trade graph's diameter is ~2, so 3 hops IS exact here).

    Frontier sets are DISTINCT (src, dst) pairs per level — level k =
    neighbors of level k-1 minus everything already reached — so every
    count is an exact integer with no tie-breaking needed anywhere.

    Scale shape: one keyed edge join + one distinct + one anti-join
    per level over the (src, dst) pair table — the bounded-shuffles-
    per-round contract; pair state is nodes², a control-plane quantity
    for any dimension-sized graph (for billion-node graphs you shard
    the source set, same plan per shard)."""
    l = t(spark, sf_dir, "lineitem").alias("l")
    o = t(spark, sf_dir, "orders").alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    s = t(spark, sf_dir, "supplier").alias("s")
    nation = t(spark, sf_dir, "nation")

    edges0 = (
        l.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"))
        .join(s, F.col("l.l_suppkey") == F.col("s.s_suppkey"))
        .select(
            F.col("c.c_nationkey").alias("src"),
            F.col("s.s_nationkey").alias("dst"),
        )
    )
    sym = (
        edges0.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionAll(edges0.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    frontier = nodes.select(F.col("node").alias("srcn"), F.col("node").alias("dst"))
    visited = frontier
    levels = []
    for _ in range(CLOSE_HOPS):
        nxt = (
            frontier.join(sym, frontier.dst == sym.u)
            .select("srcn", F.col("v").alias("dst"))
            .where(F.col("srcn") != F.col("dst"))
            .distinct()
            .join(visited, ["srcn", "dst"], "left_anti")
        )
        levels.append(nxt)
        visited = visited.unionByName(nxt).distinct().localCheckpoint()
        frontier = nxt
    counts = None
    for k, lv in enumerate(levels, start=1):
        ck = lv.groupBy("srcn").agg(
            F.count(F.lit(1)).cast("long").alias(f"n{k}")
        )
        counts = ck if counts is None else counts.join(ck, "srcn", "full")
    sums = (
        nodes.join(counts, nodes.node == counts.srcn, "left")
        .select(
            "node",
            sum(
                F.coalesce(F.col(f"n{k}"), F.lit(0)) for k in range(1, CLOSE_HOPS + 1)
            ).cast("long").alias("n_reached"),
            sum(
                F.coalesce(F.col(f"n{k}"), F.lit(0)) * k
                for k in range(1, CLOSE_HOPS + 1)
            ).cast("long").alias("dist_sum"),
        )
    )
    return (
        sums.join(nation.select(F.col("n_nationkey").alias("node"), "n_name"), "node")
        .select(
            "n_name",
            "n_reached",
            "dist_sum",
            F.expr(
                "CAST(CASE WHEN dist_sum > 0"
                " THEN n_reached * 1000000 DIV dist_sum ELSE 0 END AS BIGINT)"
            ).alias("closeness_ppm"),
        )
    )


def _modularity_oracle() -> str:
    # Q_ppm via the overflow-safe three-step floor decomposition of
    # floor((num + D) * 1e6 / D) - 1e6 with D = m2^2: num is offset by
    # +D (modularity >= -1 bounds num >= -D) so every divided operand
    # is non-negative, and the *1e6 is split 1000 x 1000 so no
    # intermediate exceeds ~1e17 at the 10x probe (m2 ~ 1.2e7,
    # D ~ 1.5e14) — BIGINT-safe on both engines, floor-exact by the
    # identity a*1000 = (a div D)*1000*D + (a%d)*1000.
    return f"""
    WITH {_lp_chain_sql()},
    deg AS (SELECT u, CAST(sum(w) AS BIGINT) AS k FROM sym GROUP BY u),
    mm AS (SELECT CAST(sum(w) AS BIGINT) AS m2 FROM sym),
    nm AS (
      SELECT CAST(sum(
               CAST(coalesce(e.w, 0) AS BIGINT) * mm.m2
               - CAST(coalesce(du.k, 0) AS BIGINT)
                 * CAST(coalesce(dv.k, 0) AS BIGINT)
             ) AS BIGINT) AS num,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM lp{LP_ROUNDS} a
      JOIN lp{LP_ROUNDS} b ON a.lbl = b.lbl
      LEFT JOIN sym e ON e.u = a.node AND e.v = b.node
      LEFT JOIN deg du ON du.u = a.node
      LEFT JOIN deg dv ON dv.u = b.node
      CROSS JOIN mm
    ),
    parts AS (
      SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
             CAST((SELECT count(DISTINCT lbl) FROM lp{LP_ROUNDS}) AS BIGINT)
               AS n_communities,
             mm.m2 AS m2,
             nm.num + mm.m2 * mm.m2 AS a,
             mm.m2 * mm.m2 AS d
      FROM mm CROSS JOIN nm
    )
    SELECT n_nodes, n_communities, m2,
           CAST((a // d) * 1000000
                + ((a % d) * 1000 // d) * 1000
                + (((a % d) * 1000 % d) * 1000) // d
                - 1000000 AS BIGINT) AS q_ppm
    FROM parts
    """


@query("q_graph_modularity", _modularity_oracle())
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of q_graph_label_prop's communities over the
    weighted nation trade graph (Newman & Girvan 2004): Q = (1/2m) ·
    Σ_{{uv: c_u=c_v}} (A_uv − k_u·k_v/2m), reported in exact ppm — the
    community-QUALITY readout that closes the loop on the graph
    family: label prop proposes the partition, this key scores it (the
    number you compare against a null/random partition before trusting
    the communities downstream).

    Exactness: the statistic is DEFINED as an integer recipe — num =
    Σ_same (w_uv·m2 − k_u·k_v) over all same-community node pairs
    (missing edges contribute only the −k_u·k_v expectation term),
    then Q_ppm = floor((num + D)·1e6 / D) − 1e6 with D = m2², the +D
    offset keeping every divided operand non-negative (Q ≥ −1) and the
    1e6 split 1000×1000 so nothing overflows BIGINT at the 10x probe.
    Both engines run the identical decomposition, so the hash is exact.

    Scale shape: identical to q_graph_label_prop — the distributed
    work is the fact-chain edge aggregation; the pair sum runs over
    same-community pairs of the ≤25-node control-plane graph in driver
    arithmetic. A corpus-scaled graph would compute the same num as a
    (community ⨝ community) keyed aggregate of edges plus a per-
    community Σk rollup — one extra shuffle, no pair blowup."""
    edge_rows, node_ids = _trade_sym_collect(spark, sf_dir)
    lbl = _label_prop_assign(edge_rows, node_ids)
    w_of = {(u, v): w for u, v, w in edge_rows}
    k = {n: 0 for n in node_ids}
    for u, v, w in edge_rows:
        k[u] += w
    m2 = sum(w for _, _, w in edge_rows)
    num = 0
    for a in node_ids:
        for b in node_ids:
            if lbl[a] != lbl[b]:
                continue
            num += w_of.get((a, b), 0) * m2 - k[a] * k[b]
    d = m2 * m2
    av = num + d
    q_ppm = (
        (av // d) * 1_000_000
        + ((av % d) * 1000 // d) * 1000
        + (((av % d) * 1000 % d) * 1000) // d
        - 1_000_000
    )
    return spark.createDataFrame(
        [
            (
                len(node_ids),
                len(set(lbl.values())),
                m2,
                q_ppm,
            )
        ],
        "n_nodes bigint, n_communities bigint, m2 bigint, q_ppm bigint",
    )


# --- connected components over the spatial graph (round 9) --------------

_CONCOMP_ORACLE = f"""
    WITH RECURSIVE pts AS ({GEO_PTS_SQL}),
    e0 AS ({geo_edges_sql()}),
    edges AS (
      SELECT user_a AS src, user_b AS dst FROM e0
      UNION ALL
      SELECT user_b, user_a FROM e0
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges GROUP BY src
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
    ),
    lbl0 AS (SELECT node, min(r) AS comp FROM reach GROUP BY node),
    lbl AS (
      SELECT p.user_id AS node, coalesce(l.comp, p.user_id) AS comp
      FROM pts p LEFT JOIN lbl0 l ON l.node = p.user_id
    ),
    ec AS (
      SELECT l.comp, CAST(count(*) AS BIGINT) AS n_edges
      FROM e0 JOIN lbl l ON l.node = e0.user_a
      GROUP BY l.comp
    )
    SELECT l.comp,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(coalesce(min(ec.n_edges), 0) AS BIGINT) AS n_edges,
           CAST(sum(l.node) AS BIGINT) AS sum_ids
    FROM lbl l LEFT JOIN ec ON ec.comp = l.comp
    GROUP BY l.comp
"""


@query("q_graph_concomp", _CONCOMP_ORACLE, quadratic_oracle=True)
def q_graph_concomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components as a FIRST-CLASS graph operator, on the one
    graph in the fixtures whose node count scales with the data (the
    spatial-proximity graph of q_graph_triangles/q_geo_gridjoin) — so
    unlike reachability/SSSP's nations^2 edge sets, the distributed
    form is forced: no driver-side recursion is valid here.

    Algorithm: hash-min label propagation WITH pointer jumping — each
    round takes the min label over neighbors (one keyed shuffle) and
    then short-circuits through the label table itself
    (lbl(v) <- lbl(lbl(v)), a second keyed join), which contracts label
    chains by doubling, so convergence is O(log diameter) rounds
    instead of O(diameter) (Kiveris et al., "Connected Components in
    MapReduce and Beyond" — the same contraction GraphFrames/GraphX
    run). Only the converged flag ever crosses to the driver. At the
    fixture radius the spatial graph percolates into one giant
    component spanning the domain (~20+ hops across), which is exactly
    the regime where plain min-propagation pays diameter-many shuffles
    and pointer jumping pays log-many.

    Output is the component census: canonical label (min user_id),
    node count, intra-component edge count, and the exact sum of member
    ids — the sum pins MEMBERSHIP, so a single node in the wrong
    component fails the hash even when the size survives. Isolated
    points (no radius neighbor) appear as singletons with n_edges = 0.

    Oracle: DuckDB recursive reachability closure + min-per-node (the
    q_dedup_clusters recipe); the closure is |component|^2-sized —
    honest and fine at fixture scale, the thing the log-round Spark
    form exists to avoid at 100 TB.

    Scale shape: edges come from the grid-blocked radius join (never
    all-pairs), localCheckpoint'ed once; every round is two keyed
    exchanges over (node, lbl) pairs; rounds are log-bounded. At 100 TB
    the same loop runs with the label table hash-partitioned on node —
    the shuffles stay (node-count)-sized, independent of corpus bytes."""
    e0 = geo_pairs(spark, sf_dir).select("user_a", "user_b").localCheckpoint()
    edges = e0.unionByName(
        e0.select(F.col("user_b").alias("user_a"), F.col("user_a").alias("user_b"))
    ).toDF("src", "dst")

    nodes = (
        t(spark, sf_dir, "events").select(F.col("user_id").alias("node")).distinct()
    )
    labels = nodes.withColumn("lbl", F.col("node")).localCheckpoint()

    while True:
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        l1 = labels.join(nbr, labels["node"] == nbr["src"], "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias(
                "lbl"
            ),
            F.col("lbl").alias("old_lbl"),
        )
        # pointer jump: lbl(v) <- lbl(lbl(v)) — chains halve every round
        parent = l1.select(
            F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl")
        )
        l2 = (
            l1.join(parent, l1["lbl"] == parent["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("p_lbl"), F.col("lbl"))
                ).alias("new_lbl"),
                "old_lbl",
            )
            .localCheckpoint()
        )
        changed = l2.filter(F.col("new_lbl") != F.col("old_lbl")).count()
        # l2 is already localCheckpoint'ed; labels is a narrow select
        # over it, so a second checkpoint here only re-materialized the
        # same rows (one extra job per round — removed in r12).
        labels = l2.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break

    ec = (
        e0.join(labels, e0["user_a"] == labels["node"])
        .groupBy("lbl")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .withColumnRenamed("lbl", "ec_lbl")
    )
    # no pinned broadcast on the per-component edge census (VERDICT r9
    # #7): ec has one row per component — up to node-count rows on a
    # singleton-heavy graph, so it is NOT bounded small. Both sides are
    # keyed on lbl; AQE broadcasts from runtime stats when ec is small
    # and falls back to a shuffle join when it isn't.
    return (
        labels.groupBy("lbl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("node").cast("long").alias("sum_ids"),
        )
        .join(ec, F.col("lbl") == F.col("ec_lbl"), "left")
        .select(
            F.col("lbl").alias("comp"),
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0)).cast("long").alias("n_edges"),
            "sum_ids",
        )
    )


# --- degree assortativity (round 10) --------------------------------------

_ASSORT_ORACLE = f"""
    WITH pts AS ({GEO_PTS_SQL}),
    e AS ({geo_edges_sql(TRI_RADIUS)}),
    dirs AS (
      SELECT user_a AS u, user_b AS v FROM e
      UNION ALL
      SELECT user_b, user_a FROM e
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM dirs GROUP BY u),
    xy AS (
      SELECT du.d AS x, dv.d AS y
      FROM dirs
      JOIN deg du ON du.u = dirs.u
      JOIN deg dv ON dv.u = dirs.v
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM xy
    )
    SELECT m AS m_directed, sx AS sum_deg, sxx AS sum_deg_sq,
           sxy AS sum_deg_prod,
           round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / nullif(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0), 4)
             AS assortativity
    FROM m
"""


@query("q_graph_assortativity", _ASSORT_ORACLE)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the spatial-proximity graph (Newman
    2002): the Pearson correlation of degrees across edge endpoints —
    positive = hubs attach to hubs (social-network shape), negative =
    hubs attach to leaves (infrastructure/star shape). THE one-number
    mixing diagnostic read next to q_graph_degree_dist's tail: it
    decides whether hub skew compounds (assortative hubs form a dense
    core that a vertex-cut partitioner must split) or disperses.

    Exactness: both marginals of the directed-edge degree census are
    IDENTICAL (every undirected edge contributes both directions), so
    Pearson r collapses to (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²) — no
    sqrt at all. Moments are exact BIGINT (emitted for the invariant
    test to recompute r); the final expression is IEEE doubles in one
    identical form both engines, 4-dp rounded. The denominator
    m·Σx² − (Σx)² is wrapped in nullif(·, 0) on BOTH engines (ADVICE
    r10): on a degree-regular graph (every node the same degree, e.g.
    a perfect matching) the degree variance is exactly 0 and r is
    undefined — the guard makes that a uniform NULL instead of a
    NaN/Inf whose cross-engine canonicalization could diverge.

    Scale shape: grid-blocked radius self-join for edges (never
    all-pairs), one keyed degree agg, TWO broadcast-able joins of the
    directed edge list against the degree table (node-count-sized), one
    1-row moment aggregate. Linear in edges at 100 TB."""
    e = geo_pairs(spark, sf_dir, TRI_RADIUS).select("user_a", "user_b")
    dirs = e.unionAll(
        e.select(F.col("user_b").alias("user_a"), F.col("user_a").alias("user_b"))
    ).select(F.col("user_a").alias("u"), F.col("user_b").alias("v"))
    deg = dirs.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    xy = (
        dirs.join(deg.select(F.col("u").alias("ju"), F.col("d").alias("x")),
                  F.col("u") == F.col("ju"))
        .join(deg.select(F.col("u").alias("jv"), F.col("d").alias("y")),
              F.col("v") == F.col("jv"))
        .select("x", "y")
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return m.select(
        F.col("m").alias("m_directed"),
        F.col("sx").alias("sum_deg"),
        F.col("sxx").alias("sum_deg_sq"),
        F.col("sxy").alias("sum_deg_prod"),
        F.expr(
            "round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
            " / nullif(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0d), 4)"
        ).alias("assortativity"),
    )
