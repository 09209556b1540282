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
    """(vec_b, label_b, sim) for probe x corpus via a pre-normed 1-row
    broadcast cross join.

    History: the r2 form was a second normed scan + 1-row-broadcast
    join whose sim expression recomputed BOTH norms per pair (doubled
    HOF tree — measured ~2x the data work); rounds 3-11 collected the
    probe with .head() at build time and inlined it as 64 literals.
    That removed the join but (a) launched a driver-side Spark job +
    collect on EVERY DataFrame construction (~0.3-0.5 s of bench wall
    per build, guide §5: no collect in query paths) and (b) left
    _norm(<64-literal array>) in the per-row projection — higher-order
    functions are not constant-folded, so the probe norm was re-folded
    for every corpus row.

    The r12 form keeps the single-HOF-per-side discipline but computes
    the probe norm ONCE on the 1-row side BEFORE the broadcast: the
    per-row work is one dot fold + one corpus-norm fold (strictly less
    than the literal form), the build does zero driver work, and the
    plan is scan -> 1-row BroadcastNestedLoopJoin -> project ->
    TakeOrdered — the broadcast is bounded at exactly one row by
    construction, so the 100 TB shape is unchanged (narrow map over
    the corpus; plans/r12/q_sim_cosine_topk_after.txt).

    Parity: the probe norm routes through the same engine-side
    sequential-fold kernel (_norm) as the corpus norms and the DuckDB
    oracle's list_aggregate 'sum' — identical left-to-right IEEE
    double fold on both engines; float32->double widening is exact, so
    the probe values are the same doubles the literal form inlined
    (VERDICT r10 #3 discipline kept)."""
    emb = t(spark, sf_dir, "embeddings")
    probe = (
        emb.filter(F.col("vec_id") == PROBE_ID)
        .select(
            F.col("embedding").alias("p_emb"),
            _norm(F.col("embedding")).alias("p_nrm"),
        )
    )
    # Same operand order as the joined form: dot(probe, corpus) /
    # (probe_norm * corpus_norm). The raw sim is staged through its own
    # projection BEFORE r4 (r12, guide §1.2 step 2): r4 references its
    # argument twice (floor/abs path and signum path), and higher-order
    # functions are CodegenFallback — interpreted, no subexpression
    # elimination — so inlining would fold the dot+norm ONCE PER
    # REFERENCE per corpus row. CollapseProject keeps the multi-
    # referenced non-cheap alias staged; same doubles, half the folds.
    sim_raw = _dot(F.col("p_emb"), F.col("embedding")) / (
        F.col("p_nrm") * _norm(F.col("embedding"))
    )
    return (
        emb.filter(F.col("vec_id") != PROBE_ID)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("vec_b"),
            F.col("label").alias("label_b"),
            sim_raw.alias("sim_raw"),
        )
        .select("vec_b", "label_b", r4(F.col("sim_raw")).alias("sim"))
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
    eval_tier=True,
)
def q_sim_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL TIER — exact all-pairs baseline, O(N²) by design: the
    exactness reference you calibrate the bucketed variants against on
    CI-sized samples. The scalable PRIMARY for pair generation at
    100 TB is q_sim_ann_lsh (ann.py) — hyperplane-bucketed candidates
    with exact re-rank inside buckets.

    All-pairs similarity join at sim >= 0.40 — the V-SMART-Join
    shape, executed as block GEMM (one BLAS matmul per Arrow batch
    against a broadcast side) instead of 2M codegen HOF evaluations;
    ~10x faster than the HOF form and tileable. Semantics identical to
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
           CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
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
    # Stage the norm fold once per row (r12): inlined, the interpreted
    # HOF fold ran up to 6x per row (3 output columns x r4's two
    # references). Same doubles, one fold.
    return (
        t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.size("embedding").cast("long").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("e0"),
            F.element_at("embedding", 64).cast("double").alias("e_last"),
            _norm(F.col("embedding")).alias("nrm"),
        )
        .select(
            "vec_id",
            "label",
            "dim",
            r4(F.col("nrm")).alias("l2_norm"),
            r4(F.col("e0") / F.col("nrm")).alias("u0"),
            r4(F.col("e_last") / F.col("nrm")).alias("u_last"),
        )
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
    {MV_TOKENS} query vectors + pre-folded norms form ONE lazy 1-row
    broadcast (a 4-row pushed-down scan pivoted by a groupless agg),
    so the corpus side is a pure NARROW map (each token row computes
    {MV_TOKENS} sims against the broadcast row), followed by ONE
    keyed max-aggregate per document and a TakeOrdered top-{MAXSIM_TOP_K}
    — no shuffle except the per-doc aggregate, no driver collect in
    the build path. At 100 TB the aggregate is map-side-combined (max
    is algebraic) and token rows of one document need not be
    co-located.

    Determinism: per-pair sims use the same sequential-sum kernel and
    operand order as the oracle (see _probe_sims parity note); the
    4-way score sum is written in fixed textual order m0+m1+m2+m3 on
    both engines — never a float sum over an unordered group."""
    emb = t(spark, sf_dir, "embeddings")
    # Query tokens as ONE lazy 1-row broadcast (r12): the old form
    # collected the {MV_TOKENS} query rows with .collect() at build
    # time (a driver-side Spark job per DataFrame construction, guide
    # §5) and inlined them as literal arrays whose _norm(<literals>)
    # re-folded per corpus row (HOFs are not constant-folded). The
    # 4-row filter pivots to one row of q0..q3 via max() — arrays are
    # orderable and each token slot has exactly one non-null value, so
    # max() is pure selection — and the token norms pre-fold ONCE on
    # the 1-row side through the same sequential kernel.
    toks = list(range(MV_TOKENS))
    qrow = (
        emb.filter(F.col("vec_id") < MV_TOKENS)
        .groupBy()
        .agg(
            *[
                F.max(F.when(F.col("vec_id") == tok, F.col("embedding"))).alias(
                    f"q{tok}"
                )
                for tok in toks
            ]
        )
        .select(
            *[F.col(f"q{tok}") for tok in toks],
            *[_norm(F.col(f"q{tok}")).alias(f"qn{tok}") for tok in toks],
        )
    )

    c = (
        emb.filter(F.expr(f"vec_id div {MV_TOKENS}") != 0)
        .select(
            F.expr(f"vec_id div {MV_TOKENS}").alias("mv_doc"),
            "embedding",
            _norm(F.col("embedding")).alias("cnrm"),
        )
        .crossJoin(F.broadcast(qrow))
    )
    # query-token norms via the shared engine-side sequential-fold
    # kernel, like every other probe norm (VERDICT r10 #3 sweep)
    sim_cols = [
        (
            _dot(F.col(f"q{tok}"), F.col("embedding"))
            / (F.col(f"qn{tok}") * F.col("cnrm"))
        ).alias(f"s{tok}")
        for tok in toks
    ]
    m = (
        c.select("mv_doc", *sim_cols)
        .groupBy("mv_doc")
        .agg(*[F.max(f"s{tok}").alias(f"m{tok}") for tok in toks])
    )
    score = r4(F.col("m0") + F.col("m1") + F.col("m2") + F.col("m3"))
    scored = m.select("mv_doc", score.alias("maxsim_score"))
    keys = [F.desc("maxsim_score"), F.asc("mv_doc")]
    top = scored.orderBy(*keys).limit(MAXSIM_TOP_K)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))


_Q_SCALE = 1_000_000  # 1e6: exact integer quantization for moment sums


@query(
    "q_embed_stats",
    f"""
    WITH e AS (
      SELECT embedding[u.i] AS x, u.i - 1 AS dim
      FROM embeddings,
           UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ),
    q AS (
      SELECT dim,
             CAST(x AS DOUBLE) AS xd,
             CAST(floor(abs(CAST(x AS DOUBLE) * {_Q_SCALE}.0) + 0.5)
                  * sign(CAST(x AS DOUBLE) * {_Q_SCALE}.0) AS BIGINT) AS xq
      FROM e
    )
    SELECT CAST(dim AS INTEGER) AS dim,
           count(*) AS n_vals,
           round(CAST(sum(xq) AS DOUBLE) / count(*) / {_Q_SCALE}.0, 4) AS mean,
           round((CAST(sum(xq * xq) AS DOUBLE) / count(*)
                  - (CAST(sum(xq) AS DOUBLE) / count(*))
                    * (CAST(sum(xq) AS DOUBLE) / count(*)))
                 / {_Q_SCALE}.0 / {_Q_SCALE}.0, 4) AS variance,
           round(min(xd), 4) AS min_val,
           round(max(xd), 4) AS max_val
    FROM q GROUP BY dim
    """,
)
def q_embed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (the feature-store
    normalization table: mean/variance/min/max for every vector
    dimension) — what whitening, standardization, and drift monitors
    consume.

    Exactness: float moment sums are order-dependent, so values are
    quantized to exact 1e-6 integers first (the compat half-away
    rounding form, spelled identically on both engines) and the mean /
    raw-moment variance come from exact BIGINT sums with one double
    division each — deterministic regardless of partitioning; min/max
    need no accumulation. Bound: xq^2 sums stay far under int64 at any
    probed scale.

    Shape at 100 TB: posexplode is a narrow map (rows x 64); the
    per-dim aggregate is map-side combined with 64 groups — the
    shuffle is partitions x 64 rows. No window, no join."""
    e = (
        t(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("dim", "x"))
        .select(
            "dim",
            F.col("x").cast("double").alias("xd"),
            F.expr(
                f"cast(floor(abs(cast(x as double) * {_Q_SCALE}.0) + 0.5)"
                f" * signum(cast(x as double) * {_Q_SCALE}.0) as bigint)"
            ).alias("xq"),
        )
    )
    n = F.count(F.lit(1))
    s1 = F.sum("xq").cast("double")
    s2 = F.sum(F.col("xq") * F.col("xq")).cast("double")
    return e.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        n.alias("n_vals"),
        r4(s1 / n / _Q_SCALE).alias("mean"),
        r4((s2 / n - (s1 / n) * (s1 / n)) / _Q_SCALE / _Q_SCALE).alias("variance"),
        r4(F.min("xd")).alias("min_val"),
        r4(F.max("xd")).alias("max_val"),
    )


_PCA_Q = 1_000  # 1e3 quantization for the exact-integer Gram matrix
_PCA_VSCALE = 1_000_000  # iteration vector lives in 1e6 units
_PCA_ITERS = 3


_PCA_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, u.i - 1 AS dim,
             CAST(floor(abs(CAST(embedding[u.i] AS DOUBLE) * {_PCA_Q}.0) + 0.5)
                  * sign(CAST(embedding[u.i] AS DOUBLE) * {_PCA_Q}.0) AS BIGINT) AS xq
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ),
    g AS (
      SELECT a.dim AS i, b.dim AS j, sum(a.xq * b.xq) AS val
      FROM e a JOIN e b ON a.vec_id = b.vec_id
      GROUP BY a.dim, b.dim
    ),
    gmax AS (SELECT max(abs(val)) AS m FROM g),
    gn AS (SELECT i, j, val * {_PCA_VSCALE} // (SELECT m FROM gmax) AS v FROM g),
    v0 AS (SELECT DISTINCT i AS j, CAST({_PCA_VSCALE} AS BIGINT) AS x FROM g),
    w1 AS (SELECT gn.i, sum(gn.v * v0.x) AS w FROM gn JOIN v0 ON gn.j = v0.j GROUP BY gn.i),
    m1 AS (SELECT max(abs(w)) AS m FROM w1),
    v1 AS (SELECT i AS j, w * {_PCA_VSCALE} // (SELECT m FROM m1) AS x FROM w1),
    w2 AS (SELECT gn.i, sum(gn.v * v1.x) AS w FROM gn JOIN v1 ON gn.j = v1.j GROUP BY gn.i),
    m2 AS (SELECT max(abs(w)) AS m FROM w2),
    v2 AS (SELECT i AS j, w * {_PCA_VSCALE} // (SELECT m FROM m2) AS x FROM w2),
    w3 AS (SELECT gn.i, sum(gn.v * v2.x) AS w FROM gn JOIN v2 ON gn.j = v2.j GROUP BY gn.i),
    m3 AS (SELECT max(abs(w)) AS m FROM w3),
    v3 AS (SELECT i AS j, w * {_PCA_VSCALE} // (SELECT m FROM m3) AS x FROM w3)
    SELECT CAST(j AS INTEGER) AS dim, CAST(x AS BIGINT) AS component_scaled FROM v3
"""


@query("q_embed_pca_power", _PCA_ORACLE)
def q_embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA, first principal direction, by EXACT-INTEGER
    power iteration: embeddings quantize to 1e-3 integers, the 64x64
    Gram (second-moment) matrix accumulates as exact int64 partial
    sums per Arrow batch inside mapInPandas (numpy int64 — the
    map-side-combine shape of distributed covariance: each task emits
    one 64x64 partial, the driver sums a constant-size list), and
    {_PCA_ITERS} power iterations with per-step integer renormalization
    (v * 1e6 div max|w|) run on the constant-size matrix. Every
    operation is integer-exact, so Spark and the oracle's unrolled SQL
    iterations agree bit-for-bit — a floating PCA could never be
    hash-checked across engines.

    Scale notes: the data-sized work is ONE pass emitting 64x64
    partials (bounded by task count, not rows); renormalizing the Gram
    to 1e6 units before iterating keeps every product inside int64 at
    any probed scale (bounds in source). The driver touches only
    64x64 constants — same legitimacy class as the probe-literal
    collects. Sign/start: v0 = all-ones, fixed."""
    import numpy as np
    import pandas as pd

    dims = 64

    def partial_gram(batches):
        for pdf in batches:
            arr = np.stack(pdf["embedding"].to_numpy())
            q = np.floor(np.abs(arr.astype(np.float64) * _PCA_Q) + 0.5) * np.sign(
                arr.astype(np.float64) * _PCA_Q
            )
            qi = q.astype(np.int64)
            g = qi.T @ qi  # exact int64: |x|<=~600 -> products < 4e5/elt
            idx = np.indices(g.shape)
            yield pd.DataFrame(
                {
                    "i": idx[0].ravel().astype(np.int32),
                    "j": idx[1].ravel().astype(np.int32),
                    "val": g.ravel(),
                }
            )

    partials = (
        t(spark, sf_dir, "embeddings")
        .select("embedding")
        .mapInPandas(partial_gram, "i int, j int, val long")
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
    )
    rows = partials.collect()  # 64x64 constants — control-plane size
    G = [[0] * dims for _ in range(dims)]
    for r in rows:
        G[r["i"]][r["j"]] = int(r["val"])
    def tdiv(a: int, b: int) -> int:
        # truncate-toward-zero division (b > 0): DuckDB's integer `//`
        # truncates for negatives while Python's floors — match DuckDB.
        return abs(a) // b * (1 if a >= 0 else -1)

    gmax = max(abs(v) for row in G for v in row)
    Gn = [[tdiv(v * _PCA_VSCALE, gmax) for v in row] for row in G]

    v = [_PCA_VSCALE] * dims
    for _ in range(_PCA_ITERS):
        w = [sum(Gn[i][j] * v[j] for j in range(dims)) for i in range(dims)]
        m = max(abs(x) for x in w)
        v = [tdiv(x * _PCA_VSCALE, m) for x in w]

    return spark.createDataFrame(
        [(i, v[i]) for i in range(dims)], "dim int, component_scaled long"
    )


# --- int8 embedding quantization (round 6) ----------------------------

EQ_LEVELS = 127  # symmetric int8 grid: q in [-127, 127]
EQ_ERR_SCALE = 1_000_000_000  # per-vector error fixed-point grid (1e-9)


@query(
    "q_embed_quantize",
    f"""
    WITH v AS (
      SELECT e.vec_id, e.label,
             list_max(list_transform(e.embedding, x -> abs(CAST(x AS DOUBLE))))
               AS amax,
             e.embedding AS emb
      FROM embeddings e
    ),
    q AS (
      SELECT vec_id, label, amax,
             CASE WHEN amax = 0 THEN 0.0
                  ELSE list_aggregate(list_transform(emb, x ->
                    (CAST(x AS DOUBLE)
                     - (floor(abs(CAST(x AS DOUBLE) * {EQ_LEVELS} / amax) + 0.5)
                        * sign(CAST(x AS DOUBLE)) * amax / {EQ_LEVELS}))
                    * (CAST(x AS DOUBLE)
                     - (floor(abs(CAST(x AS DOUBLE) * {EQ_LEVELS} / amax) + 0.5)
                        * sign(CAST(x AS DOUBLE)) * amax / {EQ_LEVELS}))), 'sum')
             END AS err
      FROM v
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CAST(floor(err * {EQ_ERR_SCALE} + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_err_scaled,
           round(CAST(sum(CAST(floor(err * {EQ_ERR_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) / {EQ_ERR_SCALE}.0, 4) AS mean_sq_err
    FROM q GROUP BY label
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with exact reconstruction-
    error accounting — the compression step a vector store / training
    cache applies before shipping embeddings (4x smaller, cheap dequant).

    Per vector: scale = amax/{EQ_LEVELS}; q_i = round_half_away(x_i/scale)
    (the repo's portable floor(|y|+0.5)*sign recipe — no engine round());
    reconstruction error = sum_i (x_i - q_i*scale)^2 folded
    SEQUENTIALLY over dims (identical left-fold order both engines), so
    the per-vector double is bit-identical. Cross-row aggregation uses
    the integer-moment recipe: each error lands on a 1e-9 fixed-point
    grid as BIGINT, summed exactly in any partition order, divided once
    for presentation. A wrong scale, drifted rounding, or a skipped dim
    shifts the integer sum and fails the hash.

    Shape at 100 TB: one narrow map over the corpus (per-row dot-free
    arithmetic, JVM codegen) + one keyed aggregate; quantized vectors
    would be emitted by the same map in production — the stats here
    are the fidelity report."""
    x = F.col("x").cast("double")
    qdq = (
        F.floor(F.abs(x * EQ_LEVELS / F.col("amax")) + F.lit(0.5))
        * F.signum(x)
        * F.col("amax")
        / EQ_LEVELS
    )
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        "embedding",
        F.array_max(F.transform("embedding", lambda c: F.abs(c.cast("double")))).alias(
            "amax"
        ),
    )
    err = F.when(F.col("amax") == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.transform(
                "embedding",
                lambda c: (
                    c.cast("double")
                    - (
                        F.floor(F.abs(c.cast("double") * EQ_LEVELS / F.col("amax")) + F.lit(0.5))
                        * F.signum(c.cast("double"))
                        * F.col("amax")
                        / EQ_LEVELS
                    )
                )
                * (
                    c.cast("double")
                    - (
                        F.floor(F.abs(c.cast("double") * EQ_LEVELS / F.col("amax")) + F.lit(0.5))
                        * F.signum(c.cast("double"))
                        * F.col("amax")
                        / EQ_LEVELS
                    )
                ),
            ),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
    )
    per_vec = emb.select(
        "label",
        F.floor(err * EQ_ERR_SCALE + F.lit(0.5)).cast("long").alias("err_scaled"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("err_scaled").alias("sum_err_scaled"),
        r4(
            F.sum("err_scaled").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(float(EQ_ERR_SCALE))
        ).alias("mean_sq_err"),
    )


RRF_K = 60
RRF_LIST_N = 50  # depth of each input ranking
RRF_TOP_K = 10


from jsmr_spark.queries.text import BM25_CTE_DD as _BM25_CTE_DD


@query(
    "q_rank_fusion",
    f"""
    WITH {_BM25_CTE_DD},
    {_SIM_CTE_DD.strip().strip(',')}
    ,
    tl AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rt
      FROM bm25
    ),
    vl AS (
      SELECT vec_b AS doc_id, row_number() OVER (ORDER BY sim DESC, vec_b) AS rv
      FROM sims WHERE vec_a = {PROBE_ID} AND vec_b <> {PROBE_ID}
    ),
    fused AS (
      SELECT coalesce(t.doc_id, v.doc_id) AS doc_id,
             round(coalesce(1.0::DOUBLE / ({RRF_K} + t.rt), 0.0)
                   + coalesce(1.0::DOUBLE / ({RRF_K} + v.rv), 0.0), 4) AS rrf
      FROM (SELECT * FROM tl WHERE rt <= {RRF_LIST_N}) t
      FULL JOIN (SELECT * FROM vl WHERE rv <= {RRF_LIST_N}) v
        ON t.doc_id = v.doc_id
    )
    SELECT * FROM (
      SELECT doc_id, rrf,
             CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rnk
      FROM fused
    ) ranked WHERE rnk <= {RRF_TOP_K}
    """,
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-search reciprocal rank fusion (RRF, the standard lexical
    + vector combiner): top-50 BM25 docs and top-50 cosine neighbors of
    the probe vector fuse by sum of 1/(60 + rank), docs on one list
    only contribute that one term. Rank positions are integers and the
    two RRF terms are added in one fixed order, so both engines round
    identical doubles; every ranking orders by the ROUNDED score with
    id tiebreak (repo ranking policy).

    Scale shape: each input ranking is its operator's own scale path
    (BM25: scan + 1-row broadcast stats; cosine: narrow map, probe
    inlined) bounded by TakeOrdered(50); the fusion itself joins two
    50-row lists — at 100 TB the fused join never touches the corpus,
    which is exactly why RRF is the production hybrid combiner."""
    from jsmr_spark.queries.text import bm25_scored

    tkeys = [F.desc("bm25"), F.asc("doc_id")]
    tl = (
        bm25_scored(spark, sf_dir)
        .orderBy(*tkeys)
        .limit(RRF_LIST_N)
        .select("doc_id", F.row_number().over(Window.orderBy(*tkeys)).alias("rt"))
    )
    vkeys = [F.desc("sim"), F.asc("vec_b")]
    vl = (
        _probe_sims(spark, sf_dir)
        .orderBy(*vkeys)
        .limit(RRF_LIST_N)
        .select(
            F.col("vec_b").alias("doc_id"),
            F.row_number().over(Window.orderBy(*vkeys)).alias("rv"),
        )
    )
    fused = (
        tl.join(vl, "doc_id", "full_outer")
        .select(
            "doc_id",
            r4(
                F.coalesce(F.lit(1.0) / (RRF_K + F.col("rt")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (RRF_K + F.col("rv")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    fkeys = [F.desc("rrf"), F.asc("doc_id")]
    top = fused.orderBy(*fkeys).limit(RRF_TOP_K)
    return top.select(
        "doc_id", "rrf", F.row_number().over(Window.orderBy(*fkeys)).cast("int").alias("rnk")
    )


MRR_K = 10
MRR_QMOD = 50  # every 50th vec_id is a query -> ~2% of the corpus
MRR_LCM = 2520  # lcm(1..10): 2520/rank is an exact integer for rank<=K


@query(
    "q_rank_mrr",
    f"""
    WITH normed AS (
      SELECT vec_id, label, embedding, {_NORM_ONE_DD} AS nrm FROM embeddings
    ),
    q AS (
      SELECT vec_id AS q_id, label AS q_label, embedding, nrm
      FROM normed WHERE vec_id % {MRR_QMOD} = 0
    ),
    ranked AS (
      SELECT q.q_id, q.q_label, c.label,
             row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY round(list_aggregate(list_transform(q.embedding, (x, i) ->
                          CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum')
                          / (q.nrm * c.nrm), 4) DESC, c.vec_id
             ) AS rnk
      FROM q JOIN normed c ON c.vec_id <> q.q_id
    ),
    first_hit AS (
      SELECT q_id, min(rnk) AS first_rnk
      FROM ranked WHERE label = q_label AND rnk <= {MRR_K}
      GROUP BY q_id
    )
    SELECT q.q_label AS label,
           count(*) AS n_queries,
           CAST(count(f.first_rnk) AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN f.first_rnk IS NOT NULL
                         THEN {MRR_LCM} // f.first_rnk ELSE 0 END) AS BIGINT)
             AS rr_scaled_sum,
           CAST(sum(CASE WHEN f.first_rnk IS NOT NULL
                         THEN {MRR_LCM} // f.first_rnk ELSE 0 END) AS DOUBLE)
             / ({MRR_LCM}.0 * count(*)) AS mrr
    FROM q LEFT JOIN first_hit f ON q.q_id = f.q_id
    GROUP BY q.q_label
    """,
)
def q_rank_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 retrieval evaluation (Mean Reciprocal Rank): for every
    query vector (a deterministic ~2% id-sampled subset), rank the rest
    of the corpus by cosine and find the first same-label hit in the
    top 10; report per-label query counts, hit counts, and MRR. The
    metric sibling of q_sim_recall_report (recall@k) and q_ml_auc —
    MRR is what ranking/retrieval teams actually tune first.

    Exactness: similarities round to 4dp BEFORE ranking with a vec_id
    tie-break (the module-wide rule), and the reciprocal ranks are kept
    EXACT by scaling with lcm(1..10) = 2520: 2520/rank is an
    integer for every admissible rank, so rr_scaled_sum is an exact
    BIGINT and the final mrr double is one exact multiply + one
    correctly-rounded division from exact integers — bit-identical
    cross-engine with no float accumulation of 1/rank terms.

    Scale shape: the query side (~2%) broadcasts; candidates never
    shuffle for similarity (narrow map against the broadcast), and the
    per-query rank window partitions on q_id. This exhaustive form is
    the CI-sized evaluation harness you run on a sample — the 100 TB
    path scores the SAME metric over ANN candidates (q_sim_ann_lsh /
    _ivf feed the identical ranker), and recall@k (q_sim_recall_report)
    quantifies what that pruning costs."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = e.filter(F.col("vec_id") % MRR_QMOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    # sim_raw staged before r4 (r12): r4 references its argument twice
    # and the interpreted dot fold would run twice per (query,
    # candidate) pair — this is the heaviest exact-sim kernel in the
    # repo (2% queries x corpus). Same doubles, half the folds.
    sim_raw = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_nrm") * F.col("nrm")
    )
    ranked = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "q_label", "label", "vec_id", sim_raw.alias("sim_raw")
        )
        .select(
            "q_id", "q_label", "label", "vec_id", r4(F.col("sim_raw")).alias("sim")
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("sim"), F.asc("vec_id")
                )
            ),
        )
    )
    first_hit = (
        ranked.filter(
            (F.col("label") == F.col("q_label")) & (F.col("rnk") <= MRR_K)
        )
        .groupBy("q_id")
        .agg(F.min("rnk").alias("first_rnk"))
    )
    rr = F.when(
        F.col("first_rnk").isNotNull(),
        F.expr(f"{MRR_LCM} DIV first_rnk"),
    ).otherwise(F.lit(0))
    return (
        q.join(first_hit, "q_id", "left")
        .groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.count("first_rnk").cast("long").alias("n_hit"),
            F.sum(rr).cast("long").alias("rr_scaled_sum"),
        )
        .select(
            "label",
            "n_queries",
            "n_hit",
            "rr_scaled_sum",
            (
                F.col("rr_scaled_sum").cast("double")
                / (F.lit(float(MRR_LCM)) * F.col("n_queries"))
            ).alias("mrr"),
        )
    )


OUT_Q = 1_000  # 1e-3 quantization grid for the exact outlier distances
OUT_TOP = 10


@query(
    "q_embed_outliers",
    f"""
    WITH e AS (
      SELECT vec_id, label, u.i - 1 AS dim,
             CAST(floor(abs(CAST(embedding[u.i] AS DOUBLE) * {OUT_Q}.0) + 0.5)
                  * sign(CAST(embedding[u.i] AS DOUBLE) * {OUT_Q}.0) AS BIGINT) AS xq
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ),
    cent AS (SELECT dim, count(*) AS n, sum(xq) AS s FROM e GROUP BY dim),
    d AS (
      SELECT e.vec_id, e.label,
             CAST(sum((c.n * e.xq - c.s) * (c.n * e.xq - c.s)) AS BIGINT)
               AS dist2n2
      FROM e JOIN cent c ON c.dim = e.dim
      GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, dist2n2, rnk
    FROM (SELECT vec_id, label, dist2n2,
                 row_number() OVER (ORDER BY dist2n2 DESC, vec_id) AS rnk
          FROM d) x
    WHERE rnk <= {OUT_TOP}
    """,
)
def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier census: the {OUT_TOP} vectors farthest
    from the corpus centroid — the quality gate that catches corrupt /
    off-distribution embeddings before they poison ANN indexes or
    k-means seeds (q_embed_stats is the per-dimension view; this is
    the per-VECTOR view).

    Exactness is the k-means trick: the centroid is never materialized
    as a float mean — vectors quantize to a 1e-3 grid and the squared
    distance scales by n^2: dist2n2 = sum_d (n*xq_d - S_d)^2, an exact
    BIGINT on both engines, so the outlier ranking is an integer
    decision (tie-break vec_id). Headroom: per-dim terms stay under
    2^63/dims up to ~60k vectors at this grid; past that, coarsen the
    grid (bound scales with its square) — same documented bound as
    ml_cluster's enforced guard.

    Scale shape: one narrow posexplode, one 64-group centroid
    aggregate broadcast back, one vec-keyed aggregate, TakeOrdered
    top-{OUT_TOP}. No all-pairs anywhere — centroid distance is
    O(n*dims)."""
    e = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", F.posexplode("embedding").alias("dim", "x"))
        .select(
            "vec_id",
            "label",
            "dim",
            F.expr(
                f"cast(floor(abs(cast(x as double) * {OUT_Q}.0) + 0.5)"
                f" * signum(cast(x as double) * {OUT_Q}.0) as bigint)"
            ).alias("xq"),
        )
    )
    cent = e.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"), F.sum("xq").alias("s")
    )
    term = F.col("n") * F.col("xq") - F.col("s")
    d = (
        e.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label")
        .agg(F.sum(term * term).cast("long").alias("dist2n2"))
    )
    keys = [F.desc("dist2n2"), F.asc("vec_id")]
    top = d.orderBy(*keys).limit(OUT_TOP)
    return top.withColumn("rnk", F.row_number().over(Window.orderBy(*keys)))


_DRIFT_Q = 1_000  # 1e3 quantization: dot products of half-centroid sums stay in BIGINT


def _drift_oracle() -> str:
    from jsmr_spark.queries.dedup import hex12_sql

    half = f"({hex12_sql('md5(CAST(vec_id AS VARCHAR))')} % 2)"
    return f"""
    WITH e AS (
      SELECT label, {half} AS half, u.i - 1 AS dim,
             CAST(floor(abs(CAST(embedding[u.i] AS DOUBLE) * {_DRIFT_Q}.0) + 0.5)
                  * sign(CAST(embedding[u.i] AS DOUBLE) * {_DRIFT_Q}.0) AS BIGINT) AS xq
      FROM embeddings,
           UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ),
    s AS (
      SELECT label, half, dim, CAST(sum(xq) AS BIGINT) AS sx
      FROM e GROUP BY 1, 2, 3
    ),
    nv AS (
      SELECT label, {half} AS half, CAST(count(*) AS BIGINT) AS n
      FROM embeddings GROUP BY 1, 2
    ),
    j AS (
      SELECT a.label,
             CAST(sum(a.sx * b.sx) AS BIGINT) AS dot,
             CAST(sum(a.sx * a.sx) AS BIGINT) AS na,
             CAST(sum(b.sx * b.sx) AS BIGINT) AS nb
      FROM s a JOIN s b ON a.label = b.label AND a.dim = b.dim
      WHERE a.half = 0 AND b.half = 1
      GROUP BY a.label
    )
    SELECT j.label,
           n0.n AS n_half0, n1.n AS n_half1,
           j.dot AS dot_scaled,
           round(CAST(j.dot AS DOUBLE)
                 / sqrt(CAST(j.na AS DOUBLE) * CAST(j.nb AS DOUBLE)), 4)
             AS centroid_cosine
    FROM j
    JOIN nv n0 ON n0.label = j.label AND n0.half = 0
    JOIN nv n1 ON n1.label = j.label AND n1.half = 1
    """


@query("q_embed_drift", _drift_oracle())
def q_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: split each label's vectors
    into two deterministic portable-hash halves and report the cosine
    between the two half-centroids — at parity (same distribution) the
    cosine sits near 1; a drop flags intra-label drift or a bimodal
    label. The same split-half methodology as q_profile_drift's TVD
    gate, lifted to the embedding space; in production the two 'halves'
    become yesterday's batch vs today's.

    Exactness: values quantized to 1e3 integers (coarser than
    q_embed_stats' 1e6 because centroid SUMS get multiplied pairwise:
    sums ~1e8 per dim at the 10x probe, dot ~64·1e16 — inside BIGINT;
    at 1e6 the dot would overflow). Cosine normalization is unscaled —
    the quantization constant cancels in the ratio. One final double
    division + sqrt, rounded identically.

    Scale shape: explode -> (label, half, dim) hash agg (map-side
    combined, bounded by labels × 2 × 64 output rows), then joins on
    the bounded centroid table only. The vector corpus is scanned
    once."""
    from jsmr_spark.queries.dedup import hex12_sql

    half_expr = f"CAST({hex12_sql('md5(CAST(vec_id AS STRING))')} % 2 AS BIGINT)"
    e = (
        t(spark, sf_dir, "embeddings")
        .select(
            "label",
            F.expr(half_expr).alias("half"),
            F.posexplode("embedding").alias("dim", "x"),
        )
        .select(
            "label",
            "half",
            "dim",
            F.expr(
                f"CAST(floor(abs(CAST(x AS DOUBLE) * {_DRIFT_Q}.0) + 0.5)"
                f" * sign(CAST(x AS DOUBLE) * {_DRIFT_Q}.0) AS BIGINT)"
            ).alias("xq"),
        )
    )
    s = e.groupBy("label", "half", "dim").agg(
        F.sum("xq").cast("long").alias("sx")
    )
    nv = (
        t(spark, sf_dir, "embeddings")
        .select("label", F.expr(half_expr).alias("half"))
        .groupBy("label", "half")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    a = s.where(F.col("half") == 0).select(
        "label", "dim", F.col("sx").alias("sa")
    )
    b = s.where(F.col("half") == 1).select(
        "label", "dim", F.col("sx").alias("sb")
    )
    j = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dot"),
            F.sum(F.col("sa") * F.col("sa")).cast("long").alias("na"),
            F.sum(F.col("sb") * F.col("sb")).cast("long").alias("nb"),
        )
    )
    n0 = nv.where(F.col("half") == 0).select("label", F.col("n").alias("n_half0"))
    n1 = nv.where(F.col("half") == 1).select("label", F.col("n").alias("n_half1"))
    return (
        j.join(F.broadcast(n0), "label")
        .join(F.broadcast(n1), "label")
        .select(
            "label",
            "n_half0",
            "n_half1",
            F.col("dot").alias("dot_scaled"),
            r4(
                F.col("dot").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("centroid_cosine"),
        )
    )


# nDCG@10 discount weights: w_i = floor(1e6 / log2(i+1) + 0.5), i = 1..10,
# precomputed so neither engine evaluates a log; IDCG prefix sums follow.
_NDCG_W = [
    int(math.floor(1_000_000 / math.log2(i + 1) + 0.5)) for i in range(1, MRR_K + 1)
]
_NDCG_P = [sum(_NDCG_W[: k + 1]) for k in range(MRR_K)]  # P[k-1] = sum w_1..w_k
_NDCG_W_CASE = (
    "CASE rnk " + " ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W)) + " ELSE 0 END"
)


def _ndcg_idcg_case(nrel: str) -> str:
    arms = " ".join(f"WHEN {k + 1} THEN {p}" for k, p in enumerate(_NDCG_P))
    return f"CASE least({nrel}, {MRR_K}) {arms} ELSE 0 END"


# Fixed-SIZE query panel (VERDICT r8 #4, same design as
# q_dedup_recall_report's 1024-doc panel): the % MRR_QMOD id sample is
# a fixed FRACTION, so query count — and with it the (queries x corpus)
# eval work — grows with the corpus and the 10x probe read x9.3. The
# panel keeps the id-spread of the % sample but caps it at the first
# NDCG_PANEL_N by vec_id: eval cost is then PANEL x corpus — linear.
NDCG_PANEL_N = 32


def _ndcg_oracle() -> str:
    return f"""
    WITH normed AS (
      SELECT vec_id, label, embedding, {_NORM_ONE_DD} AS nrm FROM embeddings
    ),
    q AS (
      SELECT vec_id AS q_id, label AS q_label, embedding, nrm
      FROM normed WHERE vec_id % {MRR_QMOD} = 0
      ORDER BY vec_id LIMIT {NDCG_PANEL_N}
    ),
    lc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM embeddings
           GROUP BY label),
    ranked AS (
      SELECT q.q_id, q.q_label, c.label,
             row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY round(list_aggregate(list_transform(q.embedding, (x, i) ->
                          CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), 'sum')
                          / (q.nrm * c.nrm), 4) DESC, c.vec_id
             ) AS rnk
      FROM q JOIN normed c ON c.vec_id <> q.q_id
    ),
    dcg AS (
      SELECT q_id, CAST(sum({_NDCG_W_CASE}) AS BIGINT) AS dcg_micro
      FROM ranked WHERE label = q_label AND rnk <= {MRR_K}
      GROUP BY q_id
    ),
    per_q AS (
      SELECT q.q_label, q.q_id,
             coalesce(d.dcg_micro, 0) AS dcg_micro,
             {_ndcg_idcg_case("lc.n_label - 1")} AS idcg_micro
      FROM q
      JOIN lc ON lc.label = q.q_label
      LEFT JOIN dcg d ON d.q_id = q.q_id
    )
    SELECT q_label AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(count(*) FILTER (WHERE idcg_micro > 0) AS BIGINT) AS n_evaluable,
           CAST(sum(CASE WHEN idcg_micro > 0
                         THEN dcg_micro * 1000 // idcg_micro ELSE 0 END)
                AS BIGINT) AS ndcg_milli_sum,
           CAST(sum(CASE WHEN idcg_micro > 0
                         THEN dcg_micro * 1000 // idcg_micro ELSE 0 END)
                // nullif(count(*) FILTER (WHERE idcg_micro > 0), 0)
                AS BIGINT) AS mean_ndcg_milli
    FROM per_q GROUP BY q_label
    """


@query("q_ml_ndcg", _ndcg_oracle())
def q_ml_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{MRR_K} retrieval evaluation on the q_rank_mrr frame (the
    same % {MRR_QMOD} id sample CAPPED at a fixed {NDCG_PANEL_N}-query
    panel by vec_id — eval work is panel x corpus, linear in the
    corpus; same rounded-cosine + vec_id tie-break ranking):
    binary relevance = same label, DCG discounts 1/log2(rank+1) as
    PRECOMPUTED micro-unit integer literals (neither engine evaluates a
    log at runtime), IDCG = the literal prefix sum at min(n_relevant,
    {MRR_K}) where n_relevant comes from a label census rather than a
    per-candidate count. Completes the ranking-eval family: recall@k
    (q_sim_recall_report) counts hits, MRR rewards the first hit,
    nDCG grades the whole top-{MRR_K} ordering. Per-query nDCG is an
    exact BIGINT milli value (one floor division); the per-label mean
    is a second floor division — hash-exact.

    Scale shape: identical to q_rank_mrr — broadcast query sample,
    narrow-map similarity, per-query rank window; plus one broadcast
    label census. Same ANN-candidate substitution at 100 TB."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    q = (
        e.filter(F.col("vec_id") % MRR_QMOD == 0)
        .orderBy("vec_id")
        .limit(NDCG_PANEL_N)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    lc = (
        t(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_label"))
    )
    sim = r4(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))
    )
    ranked = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "q_label", "label", "vec_id", sim.alias("sim"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
            ),
        )
    )
    dcg = (
        ranked.where((F.col("label") == F.col("q_label")) & (F.col("rnk") <= MRR_K))
        .groupBy("q_id")
        .agg(F.expr(f"CAST(sum({_NDCG_W_CASE}) AS BIGINT)").alias("dcg_micro"))
    )
    per_q = (
        q.select("q_id", "q_label")
        .join(F.broadcast(lc.withColumnRenamed("label", "q_label")), "q_label")
        .join(dcg, "q_id", "left")
        .select(
            "q_label",
            F.coalesce(F.col("dcg_micro"), F.lit(0)).alias("dcg_micro"),
            F.expr(_ndcg_idcg_case("n_label - 1")).alias("idcg_micro"),
        )
    )
    nd = "CASE WHEN idcg_micro > 0 THEN dcg_micro * 1000 DIV idcg_micro ELSE 0 END"
    return per_q.groupBy(F.col("q_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.count(F.when(F.col("idcg_micro") > 0, 1)).cast("long").alias("n_evaluable"),
        F.expr(f"CAST(sum({nd}) AS BIGINT)").alias("ndcg_milli_sum"),
        F.expr(
            f"CAST(sum({nd}) DIV nullif(count_if(idcg_micro > 0), 0) AS BIGINT)"
        ).alias("mean_ndcg_milli"),
    )


def _dim_prune_oracle() -> str:
    return f"""
    WITH e AS (
      SELECT u.i - 1 AS dim,
             CAST(floor(abs(CAST(embedding[u.i] AS DOUBLE) * {_DRIFT_Q}.0) + 0.5)
                  * sign(CAST(embedding[u.i] AS DOUBLE) * {_DRIFT_Q}.0) AS BIGINT) AS xq
      FROM embeddings,
           UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ),
    m AS (
      SELECT dim,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xq) AS BIGINT) AS s1,
             CAST(sum(xq * xq) AS BIGINT) AS s2
      FROM e GROUP BY dim
    ),
    v AS (
      SELECT dim, n * s2 - s1 * s1 AS var_num FROM m
    ),
    tot AS (
      SELECT CAST(sum(var_num) AS BIGINT) AS tv,
             CAST(count(*) AS BIGINT) AS nd
      FROM v
    )
    SELECT CAST(v.dim AS INTEGER) AS dim,
           CAST(v.var_num AS BIGINT) AS var_num,
           CAST(CASE WHEN v.var_num * 2 * (SELECT nd FROM tot)
                          >= (SELECT tv FROM tot)
                     THEN 1 ELSE 0 END AS INTEGER) AS kept,
           CAST(v.var_num * 1000000 // (SELECT tv FROM tot) AS BIGINT)
             AS var_share_ppm
    FROM v
    """


@query("q_embed_dim_prune", _dim_prune_oracle())
def q_embed_dim_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-based embedding dimension pruning: per-dimension
    variance numerator n·Σx² − (Σx)² over exact 1e3-quantized BIGINTs
    (the q_embed_drift quantization — at 1e6 the n·Σx² product would
    leave BIGINT at the 10x probe), a dimension is KEPT when its
    variance is at least half the mean dimension variance (the
    rule stated integer-exactly as var·2·n_dims >= total), plus each
    dimension's exact-ppm share of total variance. The storage/compute
    diet that precedes ANN indexing — near-constant dimensions buy
    nothing and cost a multiply in every cosine; q_ann_mrl prunes by
    PREFIX (Matryoshka), this key prunes by measured variance.

    Scale shape: one posexplode -> 64-group hash aggregate (map-side
    combined), then control-plane arithmetic against a 1-row
    broadcast total. The vector corpus is scanned once."""
    e = (
        t(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("dim", "x"))
        .select(
            "dim",
            F.expr(
                f"CAST(floor(abs(CAST(x AS DOUBLE) * {_DRIFT_Q}.0) + 0.5)"
                f" * sign(CAST(x AS DOUBLE) * {_DRIFT_Q}.0) AS BIGINT)"
            ).alias("xq"),
        )
    )
    m = e.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("s1"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("s2"),
    )
    v = m.select(
        "dim", (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).alias("var_num")
    )
    tot = v.agg(
        F.sum("var_num").cast("long").alias("tv"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    )
    return (
        v.crossJoin(F.broadcast(tot))
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.col("var_num").cast("long").alias("var_num"),
            F.expr(
                "CAST(CASE WHEN var_num * 2 * nd >= tv THEN 1 ELSE 0 END AS INT)"
            ).alias("kept"),
            F.expr("CAST(var_num * 1000000 DIV tv AS BIGINT)").alias(
                "var_share_ppm"
            ),
        )
    )


# --- embedding Gramian / covariance precursor (round 10) -----------------

GRAM_DIMS = 16  # leading dimension block the exact Gramian is built over


@query(
    "q_embed_gram",
    f"""
    WITH e AS (
      SELECT vec_id, u.i - 1 AS dim,
             CAST(floor(abs(CAST(embedding[u.i] AS DOUBLE) * {_Q_SCALE}.0) + 0.5)
                  * sign(CAST(embedding[u.i] AS DOUBLE) * {_Q_SCALE}.0)
               AS BIGINT) AS xq
      FROM embeddings,
           UNNEST(range(1, {GRAM_DIMS} + 1)) AS u(i)
      WHERE len(embedding) >= {GRAM_DIMS}
    )
    SELECT CAST(a.dim AS INTEGER) AS dim_i,
           CAST(b.dim AS INTEGER) AS dim_j,
           count(*) AS n_vecs,
           CAST(sum(a.xq * b.xq) AS BIGINT) AS sum_xy_q,
           round(CAST(sum(a.xq * b.xq) AS DOUBLE) / count(*)
                 / {_Q_SCALE}.0 / {_Q_SCALE}.0, 4) AS second_moment
    FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.dim >= a.dim
    GROUP BY a.dim, b.dim
    """,
)
def q_embed_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding Gramian (uncentered second-moment matrix) over
    the leading {GRAM_DIMS}-dimension block — the ONE-PASS input every
    covariance-based embedding tool consumes: PCA/whitening (subtract
    the q_embed_stats means from this and you have the covariance),
    OPQ rotation fitting for the PQ index, and anisotropy diagnosis
    (Ethayarajh 2019: contextual embeddings are sharply anisotropic —
    visible here as mass concentrated in few diagonal cells).

    Exactness: the q_embed_stats recipe lifted to cross-moments —
    every coordinate is quantized ONCE to the exact 1e-6 integer grid,
    cross-products and sums are exact BIGINT (|xq| <= ~1e6 for unit-ish
    embeddings => products <= 1e12, 5e16 at 50k vectors — int64-safe;
    at true 100 TB row counts you drop the grid to 1e-4, same recipe),
    one double division + shared 4-dp round at the very end. Upper
    triangle only (the matrix is symmetric): {GRAM_DIMS}x{GRAM_DIMS}
    -> 136 output cells.

    Scale shape: narrow posexplode of the dim block (rows x
    {GRAM_DIMS}), ONE vec_id-keyed equi-self-join that fans out to the
    pair census (rows x {GRAM_DIMS}^2/2, still narrow), then a
    136-group map-side-combined hash aggregate — the classic
    distributed Gramian: no driver math, no O(n^2) in ROWS, linear in
    corpus size with a constant dim^2 factor. The full-width form at
    100 TB is the block GEMM in vectorized.py; this key is its exact
    declarative twin over the leading block."""
    # Explicit width guard on BOTH engines (ADVICE r10): without it,
    # Spark's slice+posexplode silently DROPS missing dims of a short
    # vector while the oracle's UNNEST(range) indexing keeps the row
    # with NULL xq — n_vecs would then differ per cell between engines.
    # Short vectors are excluded from the Gramian symmetrically.
    e = (
        t(spark, sf_dir, "embeddings")
        .filter(F.size("embedding") >= GRAM_DIMS)
        .select(
            "vec_id",
            F.posexplode(F.slice("embedding", 1, GRAM_DIMS)).alias("dim", "x"),
        )
        .select(
            "vec_id",
            "dim",
            F.expr(
                f"cast(floor(abs(cast(x as double) * {_Q_SCALE}.0) + 0.5)"
                f" * signum(cast(x as double) * {_Q_SCALE}.0) as bigint)"
            ).alias("xq"),
        )
    )
    a = e.select("vec_id", F.col("dim").alias("dim_i"), F.col("xq").alias("xa"))
    b = e.select("vec_id", F.col("dim").alias("dim_j"), F.col("xq").alias("xb"))
    pairs = a.join(b, "vec_id").where(F.col("dim_j") >= F.col("dim_i"))
    return pairs.groupBy(
        F.col("dim_i").cast("int").alias("dim_i"),
        F.col("dim_j").cast("int").alias("dim_j"),
    ).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sum_xy_q"),
        r4(
            F.sum(F.col("xa") * F.col("xb")).cast("double")
            / F.count(F.lit(1))
            / _Q_SCALE
            / _Q_SCALE
        ).alias("second_moment"),
    )
