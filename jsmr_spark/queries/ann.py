"""Approximate nearest neighbors: random-hyperplane LSH bucketing
(driver mandate — the scale path next to the brute-force baseline in
similarity.py).

8 signed projections -> an 8-bit bucket id per vector; the probe only
compares against its own bucket (1/256 of the corpus in expectation),
then exact cosine re-ranks the candidates. The hyperplanes are
deterministic pseudo-random vectors derived from md5 in Python and
embedded as LITERALS in both the Spark plan and the oracle SQL, so
both engines run the identical computation (same doubles, same signs,
same buckets).

Scale notes (100 TB): bucketing is a narrow map (64-dim dot with 8
broadcast planes); the corpus partitions by bucket id — candidate
generation is a partition-pruned scan, re-rank is per-bucket. Recall
is tuned by bits and multi-probe (flipping low-margin bits); the
baseline q_sim_cosine_topk measures the recall cost.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.compat import r4
from jsmr_spark.queries.common import t
from jsmr_spark.queries.similarity import PROBE_ID, _dot, _norm
from jsmr_spark.registry import query

N_PLANES = 8
N_DIMS = 64
TOP_K = 10


def _plane(p: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component values in
    [-1, 1], derived from md5 — identical constants on both engines."""
    out = []
    for d in range(N_DIMS):
        h = int(hashlib.md5(f"plane{p}_{d}".encode()).hexdigest()[:12], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


PLANES = [_plane(p) for p in range(N_PLANES)]


def _bucket_sql(vec: str) -> str:
    """SQL for the 8-bit LSH bucket of `vec` (list literal planes)."""
    bits = []
    for p, w in enumerate(PLANES):
        lit = "[" + ", ".join(f"{x:.3f}" for x in w) + "]"
        dot = (
            f"list_aggregate(list_transform({vec}, (x, i) -> "
            f"CAST(x AS DOUBLE) * ({lit}::DOUBLE[])[i]), 'sum')"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _bucket_col(vec) -> F.Column:
    bits = []
    for p, w in enumerate(PLANES):
        plane = F.array(*[F.lit(x) for x in w])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


_ANN_ORACLE = f"""
    WITH bucketed AS (
      SELECT vec_id, label, embedding, {_bucket_sql("embedding")} AS bucket
      FROM embeddings
    ),
    probe AS (SELECT * FROM bucketed WHERE vec_id = {PROBE_ID}),
    cand AS (
      SELECT b.vec_id, b.label, b.bucket,
             round(list_aggregate(list_transform(b.embedding, (x, i) ->
                       CAST(x AS DOUBLE) * CAST(p.embedding[i] AS DOUBLE)), 'sum')
               / (sqrt(list_aggregate(list_transform(b.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                  * sqrt(list_aggregate(list_transform(p.embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4)
               AS sim
      FROM bucketed b, probe p
      WHERE b.bucket = p.bucket AND b.vec_id <> {PROBE_ID}
    )
    SELECT vec_id, label, bucket, sim, rnk
    FROM (SELECT *, row_number() OVER (ORDER BY sim DESC, vec_id) AS rnk FROM cand) x
    WHERE rnk <= {TOP_K}
"""


K_CENT = 16  # IVF list count (deterministic "trained" centroids)
N_PROBE = 2  # lists probed per query


_IVF_ORACLE = f"""
    WITH normed AS (
      SELECT vec_id, label, embedding, {{norm}} AS nrm FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS cid, embedding AS c_emb, nrm AS c_nrm
      FROM normed WHERE vec_id < {K_CENT}
    ),
    scored AS (
      SELECT n.vec_id, n.label, n.embedding, n.nrm, c.cid,
             round(list_aggregate(list_transform(n.embedding, (x, i) ->
                       CAST(x AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)), 'sum')
                   / (n.nrm * c.c_nrm), 4) AS csim
      FROM normed n, cent c
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY csim DESC, cid) AS crn
      FROM scored
    ),
    assigned AS (SELECT vec_id, label, embedding, nrm, cid FROM ranked WHERE crn = 1),
    plists AS (SELECT cid FROM ranked WHERE vec_id = {PROBE_ID} AND crn <= {N_PROBE}),
    probe AS (SELECT embedding AS p_emb, nrm AS p_nrm FROM normed WHERE vec_id = {PROBE_ID}),
    cand AS (
      SELECT a.vec_id, a.label, a.cid AS list_id,
             round(list_aggregate(list_transform(a.embedding, (x, i) ->
                       CAST(x AS DOUBLE) * CAST(p.p_emb[i] AS DOUBLE)), 'sum')
                   / (a.nrm * p.p_nrm), 4) AS sim
      FROM assigned a JOIN plists l ON a.cid = l.cid CROSS JOIN probe p
      WHERE a.vec_id <> {PROBE_ID}
    )
    SELECT vec_id, label, list_id, sim, rnk
    FROM (SELECT *, row_number() OVER (ORDER BY sim DESC, vec_id) AS rnk FROM cand) x
    WHERE rnk <= {TOP_K}
""".format(
    norm=(
        "sqrt(list_aggregate(list_transform(embedding, (x, i) -> "
        "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )
)


@query("q_sim_ann_ivf", _IVF_ORACLE)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid list,
    probe the query's N_PROBE nearest lists, exact cosine re-rank.

    Centroids are deterministic (the K_CENT lowest vec_ids stand in for
    a k-means codebook — centroid QUALITY is orthogonal to the plan
    shape being exercised). The 100 TB shape is exactly this plan:
    assignment is a narrow map against K broadcast centroids + a
    per-vector argmin (keyed window over K rows, map-side); at rest the
    corpus would be WRITTEN partitioned by list_id (sink_partitioned's
    layout), making each probe a partition-pruned scan of N_PROBE/K of
    the data; re-rank is TakeOrdered over the probed lists only."""
    emb = t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "label", "embedding", _norm(F.col("embedding")).alias("nrm"))
    cent = F.broadcast(
        base.filter(F.col("vec_id") < K_CENT).select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("c_emb"),
            F.col("nrm").alias("c_nrm"),
        )
    )
    csim = r4(_dot(F.col("embedding"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm")))
    scored = base.crossJoin(cent).select(
        "vec_id", "label", "embedding", "nrm", "cid", csim.alias("csim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    ranked = scored.withColumn("crn", F.row_number().over(w))
    assigned = ranked.filter(F.col("crn") == 1).select("vec_id", "label", "embedding", "nrm", "cid")
    plists = F.broadcast(
        ranked.filter((F.col("vec_id") == PROBE_ID) & (F.col("crn") <= N_PROBE)).select("cid")
    )
    probe = F.broadcast(
        base.filter(F.col("vec_id") == PROBE_ID).select(
            F.col("embedding").alias("p_emb"), F.col("nrm").alias("p_nrm")
        )
    )
    sim = r4(_dot(F.col("embedding"), F.col("p_emb")) / (F.col("nrm") * F.col("p_nrm")))
    cand = (
        assigned.join(plists, "cid")
        .crossJoin(probe)
        .filter(F.col("vec_id") != PROBE_ID)
        .select("vec_id", "label", F.col("cid").alias("list_id"), sim.alias("sim"))
    )
    keys = [F.desc("sim"), F.asc("vec_id")]
    top = cand.orderBy(*keys).limit(TOP_K)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))


@query("q_sim_ann_lsh", _ANN_ORACLE)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: hyperplane-LSH bucket prefilter + exact cosine
    re-rank within the probe's bucket."""
    emb = t(spark, sf_dir, "embeddings").withColumn("bucket", _bucket_col(F.col("embedding")))
    probe = F.broadcast(
        emb.filter(F.col("vec_id") == PROBE_ID).select(
            F.col("embedding").alias("p_emb"), F.col("bucket").alias("p_bucket")
        )
    )
    sim = r4(_dot(F.col("embedding"), F.col("p_emb")) / (_norm(F.col("embedding")) * _norm(F.col("p_emb"))))
    cand = (
        emb.crossJoin(probe)
        .filter((F.col("bucket") == F.col("p_bucket")) & (F.col("vec_id") != PROBE_ID))
        .select("vec_id", "label", "bucket", sim.alias("sim"))
    )
    keys = [F.desc("sim"), F.asc("vec_id")]
    # TakeOrderedAndProject over the bucket's candidates; the rank
    # window only sees the k survivors.
    top = cand.orderBy(*keys).limit(TOP_K)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))
