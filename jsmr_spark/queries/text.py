"""Text-analysis operators over the documents corpus (SURVEY.md §2.B
"LLM-data-pipeline operators").

q_text_wordcount doubles as the Tier-A parity proof: it is the
canonical JsMr map/shuffle/reduce job (SURVEY.md §2.A A3+A5+A6)
expressed as explode + hash aggregate. jsmr_spark.mr runs the same
computation through the MR-compat API and tests assert equivalence.

Scale notes: tokenization is narrow (per-row, whole-stage codegen);
only the final aggregates shuffle, keyed on token / (doc_id, token),
both high-cardinality and well-distributed — no skew treatment needed.
TF-IDF joins the per-token document frequency back to term frequencies;
the df side is |vocabulary| rows (small), so it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.compat import r4
from jsmr_spark.queries.common import t
from jsmr_spark.registry import query


def tokens(df: DataFrame) -> DataFrame:
    """documents -> one row per (doc_id, token). The 'map' of wordcount."""
    return df.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))


@query(
    "q_text_wordcount",
    """
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word count — the canonical MapReduce job as explode + hash agg."""
    return tokens(t(spark, sf_dir, "documents")).groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "q_text_token_stats",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS nd_tokens,
           round(CAST(list_aggregate(list_transform(string_split(text, ' '), x -> length(x)), 'sum') AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS avg_token_len
    FROM documents
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics via array higher-order functions —
    no explode, no shuffle: a purely narrow pipeline."""
    toks = F.split(F.col("text"), " ")
    total_len = F.aggregate(F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x)
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("nd_tokens"),
        r4(total_len.cast("double") / F.size(toks)).alias("avg_token_len"),
    )


@query(
    "q_text_tfidf",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS score
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, score, rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
          FROM scored) s
    WHERE rnk <= 3
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    Ranking uses the *rounded* score (plus token tiebreak) so that
    sub-ulp libm differences between engines cannot reorder ties.

    Optimization r12 (guide §2.4 — share the exchange, don't re-derive
    the input): df (document frequency) = the number of tf rows per
    token, so it is computed as COUNT OVER (PARTITION BY token) on tf
    instead of a second groupBy + self-join. The old tf-x-df join made
    Catalyst duplicate the whole scan→explode→agg subtree for the df
    branch (documents scanned and exploded twice, 1 extra shuffle +
    1 broadcast exchange, 1 join); the window form scans the corpus
    once and reuses the one tf aggregate. Plan diff: 5 shuffle
    Exchange → 4, 2 BroadcastExchange → 1, 3 parquet scans → 2, the
    BroadcastHashJoin(token) of the duplicated df subtree gone
    (plans/r12/q_text_tfidf_{before,after}.txt).
    At 100 TB the token window partitions by the same vocabulary key
    the old df aggregate shuffled by — same bytes moved once, no
    broadcast-threshold question left (VERDICT r9 #7 still satisfied:
    nothing vocabulary-sized is ever broadcast). n_docs is a literal
    1-row aggregate — that broadcast is bounded by construction and
    stays pinned.
    """
    docs = t(spark, sf_dir, "documents")
    tf = tokens(docs).groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("token")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", r4(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", "score", "rnk")
    )


@query(
    "q_text_lang_dist",
    """
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           round(avg(n_chars), 4) AS avg_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents GROUP BY lang, source
    """,
)
def q_text_lang_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by language x source."""
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            r4(F.avg("n_chars")).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "q_corpus_divergence",
    """
    WITH tot AS (SELECT count(*) AS n FROM documents),
    lg AS (SELECT lang, count(*) AS cl FROM documents GROUP BY 1),
    sl AS (SELECT source, lang, count(*) AS csl FROM documents GROUP BY 1, 2),
    s AS (SELECT source, count(*) AS cs FROM documents GROUP BY 1)
    SELECT s.source, s.cs AS n_docs,
           round(sum((sl.csl / CAST(s.cs AS DOUBLE))
                     * ln((sl.csl * tot.n) / CAST(s.cs * lg.cl AS DOUBLE))), 4)
             AS kl_vs_corpus
    FROM s
    JOIN sl ON sl.source = s.source
    JOIN lg ON lg.lang = sl.lang
    CROSS JOIN tot
    GROUP BY s.source, s.cs
    """,
)
def q_corpus_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus drift: KL(source's language distribution ||
    whole-corpus language distribution) — the mixture-health monitor a
    training-data pipeline runs per ingest source (a source whose KL
    jumps changed its language mix). Zero-count langs contribute no
    term (sum over observed (source, lang) only), so KL is finite by
    construction.

    All probabilities derive from exact integer counts and the
    summand is ONE shared expression tree — (csl/cs) * ln(csl*n /
    (cs*cl)) — evaluated identically by both engines; the sum spans
    <=n_langs terms per source, so order drift is sub-ulp and round(,4)
    absorbs it. Scale shape: two keyed count aggregates over the
    corpus, then all remaining joins are on the tiny (source x lang)
    table; the corpus-level lang table broadcasts."""
    docs = t(spark, sf_dir, "documents")
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    lg = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cl"))
    sl = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("csl"))
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cs"))
    term = (F.col("csl") / F.col("cs").cast("double")) * F.log(
        (F.col("csl") * F.col("n")) / (F.col("cs") * F.col("cl")).cast("double")
    )
    return (
        s.join(sl, "source")
        .join(F.broadcast(lg), "lang")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", F.col("cs").alias("n_docs"))
        .agg(r4(F.sum(term)).alias("kl_vs_corpus"))
    )


# --- BM25 (shared by q_text_bm25 and q_rank_fusion) -----------------
# Fixed 3-term query; k1=1.2, b=0.75. Every probability input is an
# exact integer (tf, dl, N, df) and the float tree is written ONCE and
# mirrored token-for-token in the oracle, so both engines round
# identical doubles.
BM25_TERMS = ("data", "fast", "key")
BM25_TOP_K = 10

_BM25_TF_DD = ",\n         ".join(
    f"len(list_filter(toks, x -> x = '{t}')) AS tf{i + 1}"
    for i, t in enumerate(BM25_TERMS)
)
_BM25_DF_DD = ",\n         ".join(
    f"count(*) FILTER (WHERE tf{i + 1} > 0) AS df{i + 1}"
    for i in range(len(BM25_TERMS))
)
_BM25_SCORE_DD = "\n           + ".join(
    f"ln((CAST(nd - df{i + 1} AS DOUBLE) + 0.5) / (CAST(df{i + 1} AS DOUBLE) + 0.5) + 1.0)"
    f" * (CAST(tf{i + 1} AS DOUBLE) * 2.2)"
    f" / (CAST(tf{i + 1} AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl * nd AS DOUBLE) / CAST(nt AS DOUBLE))))"
    for i in range(len(BM25_TERMS))
)

BM25_CTE_DD = f"""bm_tf AS (
      SELECT doc_id, len(toks) AS dl,
         {_BM25_TF_DD}
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    bm_st AS (
      SELECT count(*) AS nd, CAST(sum(dl) AS BIGINT) AS nt,
         {_BM25_DF_DD}
      FROM bm_tf
    ),
    bm25 AS (
      SELECT doc_id,
             round({_BM25_SCORE_DD}, 4) AS bm25
      FROM bm_tf CROSS JOIN bm_st
    )"""


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for the fixed query, bm25 already round(,4) —
    the Spark mirror of BM25_CTE_DD (one corpus scan + a 1-row
    broadcast stats crossJoin; no shuffle of documents)."""
    # Token array staged as a column first (r12, guide §1.2 step 2):
    # inlined, split(text) was evaluated 4x per row (dl + one per
    # term-frequency filter); staged it runs once. Same counts.
    def tf_of(term: str):
        # single-arg lambda: a 2-arg HOF lambda would receive the array
        # INDEX as its second argument, not a closure default
        return F.size(F.filter(F.col("tk"), lambda x: x == F.lit(term)))

    tf_cols = [tf_of(term).alias(f"tf{i + 1}") for i, term in enumerate(BM25_TERMS)]
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.col("text"), " ").alias("tk"))
        .select("doc_id", F.size("tk").alias("dl"), *tf_cols)
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("dl").alias("nt"),
        *[
            F.count(F.when(F.col(f"tf{i + 1}") > 0, 1)).alias(f"df{i + 1}")
            for i in range(len(BM25_TERMS))
        ],
    )
    x = d.crossJoin(F.broadcast(stats))

    def component(i: int):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}").cast("double")
        idf = F.log(
            ((F.col("nd") - F.col(f"df{i}")).cast("double") + 0.5) / (df + 0.5) + 1.0
        )
        denom = tf + 1.2 * (
            0.25 + 0.75 * ((F.col("dl") * F.col("nd")).cast("double") / F.col("nt").cast("double"))
        )
        return idf * (tf * 2.2) / denom

    score = component(1)
    for i in range(2, len(BM25_TERMS) + 1):
        score = score + component(i)
    return x.select("doc_id", r4(score).alias("bm25"))


@query(
    "q_text_bm25",
    f"""
    WITH {BM25_CTE_DD}
    SELECT * FROM (
      SELECT doc_id, bm25,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rnk
      FROM bm25
    ) ranked WHERE rnk <= {BM25_TOP_K}
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking (Robertson/Sparck-Jones, the lexical-retrieval
    standard TF-IDF lacks: tf saturation via k1 and length
    normalization via b): top-10 docs for a fixed 3-term query. One
    corpus scan computes per-doc (dl, tf_i); the corpus stats (N,
    total tokens, per-term df) are ONE 1-row aggregate broadcast back
    — no shuffle of documents, rank via TakeOrdered + window over the
    10 survivors. Ranking orders by the ROUNDED score with doc_id
    tiebreak (repo ranking policy), so sub-ulp ln() drift between
    libm and the JVM can never reorder ties."""
    keys = [F.desc("bm25"), F.asc("doc_id")]
    top = bm25_scored(spark, sf_dir).orderBy(*keys).limit(BM25_TOP_K)
    from pyspark.sql import Window

    return top.select(
        "doc_id", "bm25", F.row_number().over(Window.orderBy(*keys)).cast("int").alias("rnk")
    )


ZIPF_TOP = 1000  # fit the distribution head (full fixture vocab is smaller)


@query(
    "q_text_zipf",
    f"""
    WITH freq AS (
      SELECT tok, count(*) AS f
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
    ),
    head AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
      FROM freq
    )
    SELECT CAST(count(*) AS BIGINT) AS n_fit,
           round(regr_slope(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4) AS slope,
           round(regr_intercept(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4) AS intercept
    FROM head WHERE r <= {ZIPF_TOP}
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit of the corpus token distribution: OLS slope
    of ln(freq) on ln(rank) over the top-{ZIPF_TOP} vocabulary head
    (natural corpora run slope ~ -1; a corpus whose slope drifts has a
    vocabulary-mix problem — the same monitoring family as
    q_corpus_divergence). Token counting is one explode + keyed agg;
    ranking is TakeOrdered-bounded to the fit head so the rank window
    never global-sorts a 100 TB vocabulary; regr_slope runs over
    <= {ZIPF_TOP} points. regr_* cross-engine parity is the established
    q_agg_regr pattern (sub-ulp accumulation drift, absorbed by
    round(,4))."""
    freq = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    keys = [F.desc("f"), F.asc("tok")]
    head = (
        freq.orderBy(*keys)
        .limit(ZIPF_TOP)
        .select(
            "f",
            F.row_number().over(Window.orderBy(*keys)).alias("r"),
        )
    )
    lf = F.log(F.col("f").cast("double"))
    lr = F.log(F.col("r").cast("double"))
    return head.agg(
        F.count(F.lit(1)).alias("n_fit"),
        r4(F.regr_slope(lf, lr)).alias("slope"),
        r4(F.regr_intercept(lf, lr)).alias("intercept"),
    )


ENT_SCALE = 1_000_000  # 1e-6 fixed-point grid for ln() values


def _lnq_sql(x: str) -> str:
    """ln(x) snapped to the 1e-6 grid as BIGINT — the perplexity
    recipe: libm ln is <=1ulp (not correctly rounded), so each distinct
    value's log is quantized ONCE and every downstream aggregate is
    exact integer arithmetic in any partition order."""
    return (
        f"CAST(floor(ln(CAST({x} AS DOUBLE)) * {ENT_SCALE} + 0.5) AS BIGINT)"
    )


@query(
    "q_text_entropy",
    f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    cnt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token),
    s AS (
      SELECT lang,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             count(*) AS n_distinct,
             CAST(sum(c * {_lnq_sql("c")}) AS BIGINT) AS clnc_scaled
      FROM cnt GROUP BY lang
    )
    SELECT lang, n_tokens, n_distinct, clnc_scaled,
           round((CAST({_lnq_sql("n_tokens")} AS DOUBLE)
                  - CAST(clnc_scaled AS DOUBLE) / n_tokens)
                 / {ENT_SCALE}.0, 4) AS entropy_nats
    FROM s
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token (Shannon) entropy in nats — the corpus
    DIVERSITY monitor next to q_corpus_divergence's drift monitor: a
    language whose entropy collapses is being flooded by boilerplate
    or template text long before dedup rates move. Uses the identity
    H = ln(N) − (1/N)·Σ c·ln(c) so only per-COUNT logs are needed.

    Portability: each distinct count's ln() is snapped to a 1e-6
    fixed-point BIGINT (the q_text_perplexity recipe — ln is <=1ulp
    libm on both engines, and a flip would need the true value within
    ~1e-16 of a half-grid point), making Σ c·ln(c) an exact integer in
    any partition order; the hash pins that integer, and entropy
    itself is two exact casts and a division. Headroom: the scaled sum
    stays under 2^63 to ~3e11 tokens per language; past that the sum
    column widens to DECIMAL — same bound family as the cents sums.

    Scale shape: one (lang, token) count (map-side combined), one
    per-lang rollup. Nothing sorts; nothing is per-row Python."""
    tok = t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    )
    cnt = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    lnq_c = F.expr(
        f"CAST(floor(ln(CAST(c AS DOUBLE)) * {ENT_SCALE} + 0.5) AS BIGINT)"
    )
    s = cnt.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * lnq_c).cast("long").alias("clnc_scaled"),
    )
    lnq_n = F.expr(
        f"CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * {ENT_SCALE} + 0.5) AS BIGINT)"
    )
    return s.select(
        "lang",
        "n_tokens",
        "n_distinct",
        "clnc_scaled",
        r4(
            (lnq_n.cast("double") - F.col("clnc_scaled").cast("double") / F.col("n_tokens"))
            / F.lit(float(ENT_SCALE))
        ).alias("entropy_nats"),
    )
