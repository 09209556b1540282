"""Vector similarity search / kNN / multimodal join (SURVEY.md §2.B
LLM-pipeline tier).

Cosine similarity is computed explicitly as dot/(|a||b|) over
double-cast float32 elements with sequential summation — DuckDB's
built-in list_cosine_similarity accumulates in float32 (verified) and
is NOT parity-safe, so both engines run the same elementwise formula:
Spark zip_with/aggregate HOFs, DuckDB indexed-lambda list_transform.
Similarities are rounded to 4dp BEFORE ranking so sub-ulp summation
drift can never reorder ties; ties break on vec_id.

Scale notes (100 TB):
  * q_sim_cosine_topk broadcasts the probe — a narrow map over the
    corpus plus a TakeOrdered; embarrassingly parallel.
  * q_sim_threshold_pairs is the O(n^2) exact baseline, fine at bench
    scale; the scale path is the MinHash/LSH prefilter (see dedup.py)
    or an IVF partition-by-centroid variant — candidates only, then
    this exact kernel re-ranks.
  * q_knn_label is top-k then a tiny vote aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.compat import r4
from jsmr_spark.queries.common import t
from jsmr_spark.registry import query

PROBE_ID = 0
TOP_K = 10
KNN_K = 5
PAIR_THRESHOLD = 0.40

# DuckDB fragments (indexed lambdas; i is 1-based). Norms are
# precomputed once per vector — the naive form recomputes both norms
# per PAIR, tripling the flops of an all-pairs join (measured). The
# formula dot/(norm_a*norm_b) is kept textually identical so the
# precompute cannot change a single bit of the result.
_DOT_DD = (
    "list_aggregate(list_transform(a.embedding, (x, i) -> "
    "CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')"
)
_NORM_ONE_DD = (
    "sqrt(list_aggregate(list_transform(embedding, (x, i) -> "
    "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
)

_SIM_CTE_DD = f"""
    normed AS (
      SELECT vec_id, label, embedding, {_NORM_ONE_DD} AS nrm FROM embeddings
    ),
    sims AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label_a, b.label AS label_b,
             round({_DOT_DD} / (a.nrm * b.nrm), 4) AS sim
      FROM normed a, normed b
    )
"""


def _dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (sequential left-to-right
    summation, matching DuckDB's list_aggregate order exactly).

    Note: an unrolled 64-term element_at expression was tried and is
    3-4x SLOWER — the giant expression tree falls out of whole-stage
    codegen; the HOF loop stays inside it. Keep the HOF form."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def _normed(spark: SparkSession, sf_dir: str, prefix: str) -> DataFrame:
    """embeddings with the norm precomputed once per vector."""
    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").alias(f"vec_{prefix}"),
        F.col("label").alias(f"label_{prefix}"),
        F.col("embedding").alias(f"emb_{prefix}"),
        _norm(F.col("embedding")).alias(f"nrm_{prefix}"),
    )


def _pairwise_sims(spark: SparkSession, sf_dir: str, probe_only: bool) -> DataFrame:
    """(vec_a, vec_b, label_b, sim) for all pairs, or probe x all.

    Norms are computed once per row before the join (same formula both
    engines — see _SIM_CTE_DD note)."""
    a = _normed(spark, sf_dir, "a")
    if probe_only:
        a = F.broadcast(a.filter(F.col("vec_a") == PROBE_ID))
    b = _normed(spark, sf_dir, "b")
    sim = r4(_dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b")))
    joined = a.crossJoin(b) if probe_only else b.crossJoin(F.broadcast(a))
    return joined.select("vec_a", "vec_b", "label_a", "label_b", sim.alias("sim"))


@query(
    "q_sim_cosine_topk",
    f"""
    WITH {_SIM_CTE_DD}
    SELECT vec_b, label_b, sim, rnk
    FROM (SELECT vec_b, label_b, sim,
                 row_number() OVER (ORDER BY sim DESC, vec_b) AS rnk
          FROM sims WHERE vec_a = {PROBE_ID} AND vec_b <> {PROBE_ID}) x
    WHERE rnk <= {TOP_K}
    """,
)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors of the probe vector (brute-force exact
    baseline; probe broadcast, corpus never shuffled)."""
    sims = _pairwise_sims(spark, sf_dir, probe_only=True).filter(F.col("vec_b") != PROBE_ID)
    keys = [F.desc("sim"), F.asc("vec_b")]
    # orderBy.limit executes as TakeOrderedAndProject (per-partition
    # heaps + one k-row merge — no global sort); the rank window then
    # only ever sees the k survivors.
    top = sims.select("vec_b", "label_b", "sim").orderBy(*keys).limit(TOP_K)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))


@query(
    "q_sim_threshold_pairs",
    f"""
    WITH {_SIM_CTE_DD}
    SELECT vec_a, vec_b, sim
    FROM sims
    WHERE vec_a < vec_b AND sim >= {PAIR_THRESHOLD}
    """,
)
def q_sim_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs similarity join at sim >= 0.40 — the V-SMART-Join
    shape, executed as block GEMM (one BLAS matmul per Arrow batch
    against a broadcast side) instead of 2M codegen HOF evaluations;
    ~10x faster and the tileable 100 TB form. Semantics identical to
    the sequential kernel (see jsmr_spark/vectorized.py)."""
    from jsmr_spark.vectorized import block_cosine_pairs

    return block_cosine_pairs(t(spark, sf_dir, "embeddings"), PAIR_THRESHOLD)


@query(
    "q_knn_label",
    f"""
    WITH {_SIM_CTE_DD},
    neigh AS (
      SELECT vec_b, label_b, sim,
             row_number() OVER (ORDER BY sim DESC, vec_b) AS rnk
      FROM sims WHERE vec_a = {PROBE_ID} AND vec_b <> {PROBE_ID}
    ),
    votes AS (
      SELECT label_b AS label, count(*) AS votes
      FROM neigh WHERE rnk <= {KNN_K}
      GROUP BY label_b
    )
    SELECT {PROBE_ID} AS probe_id, label AS predicted_label, votes
    FROM (SELECT *, row_number() OVER (ORDER BY votes DESC, label) AS vr FROM votes) v
    WHERE vr = 1
    """,
)
def q_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification of the probe: majority label among the 5
    nearest neighbors (ties broken by label)."""
    sims = _pairwise_sims(spark, sf_dir, probe_only=True).filter(F.col("vec_b") != PROBE_ID)
    # Both ranks use the TakeOrderedAndProject form (orderBy.limit):
    # the k-neighbor cut never globally sorts the corpus, and the
    # winning label is a 1-row take over the tiny vote aggregate.
    neigh = sims.orderBy(F.desc("sim"), F.asc("vec_b")).limit(KNN_K)
    votes = neigh.groupBy(F.col("label_b").alias("label")).agg(
        F.count(F.lit(1)).alias("votes")
    )
    return (
        votes.orderBy(F.desc("votes"), F.asc("label"))
        .limit(1)
        .select(
            F.lit(PROBE_ID).cast("int").alias("probe_id"),
            F.col("label").alias("predicted_label"),
            "votes",
        )
    )


@query(
    "q_multimodal_join",
    """
    SELECT d.lang, e.label,
           count(*) AS n,
           sum(d.n_chars) AS sum_chars,
           round(avg(d.n_chars), 4) AS avg_chars,
           min(d.doc_id) AS min_doc,
           max(d.doc_id) AS max_doc
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang, e.label
    """,
)
def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal join: text table x vector table on doc_id=vec_id,
    aggregated by language x embedding label."""
    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
            r4(F.avg("n_chars")).alias("avg_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "q_embed_normalize",
    f"""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT) AS dim,
           round({_NORM_ONE_DD}, 4) AS l2_norm,
           round(CAST(embedding[1] AS DOUBLE) / {_NORM_ONE_DD}, 4) AS u0,
           round(CAST(embedding[64] AS DOUBLE) / {_NORM_ONE_DD}, 4) AS u_last
    FROM embeddings
    """,
)
def q_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature normalization: L2 norm per embedding plus the first/last
    unit-vector components — the standard pre-index step before cosine
    ANN (normalized vectors reduce cosine to dot product).

    Same sequential double-cast summation kernel as the similarity
    queries (DuckDB's float32 list intrinsics are not parity-safe —
    module docstring). A narrow map over the scan: no shuffle, no UDF,
    scales linearly with rows."""
    nrm = _norm(F.col("embedding"))
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        r4(nrm).alias("l2_norm"),
        r4(F.element_at("embedding", 1).cast("double") / nrm).alias("u0"),
        r4(F.element_at("embedding", 64).cast("double") / nrm).alias("u_last"),
    )
