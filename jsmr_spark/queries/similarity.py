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
  * q_sim_cosine_topk inlines the probe as literals — a narrow map
    over the corpus plus a TakeOrdered; embarrassingly parallel, no
    join in the plan at all.
  * q_sim_threshold_pairs is the O(n^2) exact baseline, fine at bench
    scale; the scale path is the MinHash/LSH prefilter (see dedup.py)
    or an IVF partition-by-centroid variant — candidates only, then
    this exact kernel re-ranks.
  * q_knn_label is top-k then a tiny vote aggregate.
"""

from __future__ import annotations

import math

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


def _probe_sims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_b, label_b, sim) for probe x corpus, with the probe embedding
    and its norm collected ONCE and inlined as literals.

    The r2 form built the probe side as a second normed scan +
    1-row-broadcast nested-loop join; the join stage plus the doubled
    HOF expression tree dominated the query's per-run cost at bench
    scale (plan-build + compile, measured ~2x the data work), and at
    100 TB a 1-row broadcast join is still strictly worse than the
    narrow map this form compiles to (scan -> project -> TakeOrdered,
    no join, no exchange). The probe collect is a 1-row pushed-down
    parquet read at plan-build time.

    Parity: the Python accumulation below runs the same IEEE double ops
    in the same left-to-right order as the engine-side HOF kernel and
    the DuckDB oracle (float32 widens exactly; += is the same sequential
    double add), so every bit of sim is unchanged on both engines."""
    row = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == PROBE_ID)
        .select("embedding")
        .head()
    )
    emb_p = [float(x) for x in row[0]]
    acc = 0.0
    for x in emb_p:
        acc += x * x
    nrm_p = math.sqrt(acc)
    plit = F.array(*[F.lit(x) for x in emb_p])
    # Same operand order as the joined form: dot(probe, corpus) /
    # (probe_norm * corpus_norm).
    sim = r4(_dot(plit, F.col("embedding")) / (F.lit(nrm_p) * _norm(F.col("embedding"))))
    return (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") != PROBE_ID)
        .select(
            F.col("vec_id").alias("vec_b"),
            F.col("label").alias("label_b"),
            sim.alias("sim"),
        )
    )


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
    baseline; probe inlined as literals, corpus never shuffled)."""
    sims = _probe_sims(spark, sf_dir)
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
    sims = _probe_sims(spark, sf_dir)
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


MV_TOKENS = 4  # vectors per multi-vector document (vec_id div 4 groups)
MAXSIM_TOP_K = 10


_MAXSIM_ORACLE = f"""
    WITH cn AS (
      SELECT vec_id // {MV_TOKENS} AS mv_doc, vec_id % {MV_TOKENS} AS tok,
             embedding, {_NORM_ONE_DD} AS nrm
      FROM embeddings
    ),
    qv AS (SELECT tok, embedding, nrm FROM cn WHERE mv_doc = 0),
    cv AS (SELECT mv_doc, embedding, nrm FROM cn WHERE mv_doc <> 0),
    sims AS (
      SELECT cv.mv_doc, qv.tok AS qtok,
             list_aggregate(list_transform(qv.embedding, (x, i) ->
               CAST(x AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE)), 'sum')
               / (qv.nrm * cv.nrm) AS sim
      FROM cv, qv
    ),
    m AS (
      SELECT mv_doc,
             max(CASE WHEN qtok = 0 THEN sim END) AS m0,
             max(CASE WHEN qtok = 1 THEN sim END) AS m1,
             max(CASE WHEN qtok = 2 THEN sim END) AS m2,
             max(CASE WHEN qtok = 3 THEN sim END) AS m3
      FROM sims GROUP BY mv_doc
    )
    SELECT mv_doc, maxsim_score, rnk FROM (
      SELECT mv_doc, round(m0 + m1 + m2 + m3, 4) AS maxsim_score,
             row_number() OVER (ORDER BY round(m0 + m1 + m2 + m3, 4) DESC, mv_doc) AS rnk
      FROM m
    ) x WHERE rnk <= {MAXSIM_TOP_K}
"""


@query("q_sim_maxsim", _MAXSIM_ORACLE)
def q_sim_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector late-interaction retrieval (the ColBERT MaxSim
    operator): documents are groups of {MV_TOKENS} token vectors
    (vec_id div {MV_TOKENS}); the query is group 0; a document's score
    is sum over query tokens of the MAX cosine against any of its own
    token vectors. This is the modern retrieval scorer single-vector
    cosine cannot express — a token must find its best counterpart,
    not an average.

    Plan shape (the q_sim_cosine_topk lesson applied): the
    {MV_TOKENS} query vectors + norms are collected once at plan-build
    time and inlined as literals, so the corpus side is a pure NARROW
    map (each token row computes {MV_TOKENS} sims), followed by ONE
    keyed max-aggregate per document and a TakeOrdered top-{MAXSIM_TOP_K}
    — no join, no exchange except the per-doc aggregate. At 100 TB the
    aggregate is map-side-combined (max is algebraic) and token rows of
    one document need not be co-located.

    Determinism: per-pair sims use the same sequential-sum kernel and
    operand order as the oracle (see _probe_sims parity note); the
    4-way score sum is written in fixed textual order m0+m1+m2+m3 on
    both engines — never a float sum over an unordered group."""
    emb = t(spark, sf_dir, "embeddings")
    qrows = (
        emb.filter(F.col("vec_id") < MV_TOKENS)
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    qlits = []
    for r in qrows:
        vals = [float(x) for x in r.embedding]
        acc = 0.0
        for x in vals:
            acc += x * x
        qlits.append((int(r.vec_id), F.array(*[F.lit(x) for x in vals]), math.sqrt(acc)))

    c = emb.filter(F.expr(f"vec_id div {MV_TOKENS}") != 0).select(
        F.expr(f"vec_id div {MV_TOKENS}").alias("mv_doc"),
        "embedding",
        _norm(F.col("embedding")).alias("cnrm"),
    )
    sim_cols = [
        (_dot(ql, F.col("embedding")) / (F.lit(qn) * F.col("cnrm"))).alias(f"s{tok}")
        for tok, ql, qn in qlits
    ]
    m = (
        c.select("mv_doc", *sim_cols)
        .groupBy("mv_doc")
        .agg(*[F.max(f"s{tok}").alias(f"m{tok}") for tok, _, _ in qlits])
    )
    score = r4(F.col("m0") + F.col("m1") + F.col("m2") + F.col("m3"))
    scored = m.select("mv_doc", score.alias("maxsim_score"))
    keys = [F.desc("maxsim_score"), F.asc("mv_doc")]
    top = scored.orderBy(*keys).limit(MAXSIM_TOP_K)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))
