"""Deduplication operators (SURVEY.md §2.B LLM-pipeline tier).

Exact dedup is a hash group-by; near-dup is the full MinHash-LSH
pipeline: 3-token shingles -> portable 48-bit hash -> 16 permutation
min-hashes -> 4 bands of 4 -> band-bucket self-join for candidates ->
exact Jaccard verification. The SAME deterministic algorithm runs on
both engines, so the oracle matches bit-for-bit including LSH's
probabilistic recall (the randomness is all in the fixed seeds).

Portability choices (SURVEY.md §7.3.3):
  * Engine-native hash() differs between Spark (murmur3) and DuckDB —
    instead H(s) = first 12 hex chars of md5(s) as an integer, computed
    with the same instr/substring arithmetic on both sides.
  * Permutations h_k(x) = (a_k * x + b_k) mod 1e9+7 with small fixed
    odd a_k — products stay < 2^63.
  * Jaccard is emitted as a bare bigint/bigint division (identical
    doubles on both engines); round() would reintroduce tie risk at
    exactly-representable ratios like 5/32.

Scale notes (100 TB): every stage is a narrow map or a keyed shuffle
(shingle explode -> hash-agg by doc; band self-join keyed on the band
bucket). No driver state, no all-pairs scan: candidate generation is
O(sum of bucket sizes squared) which LSH keeps near-linear. Band-key
hot buckets (boilerplate text) are the known skew risk — AQE skew join
plus an optional bucket-size cap handle it.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.queries.common import t
from jsmr_spark.registry import query


def _persist_sets(df: DataFrame) -> DataFrame:
    """Intra-query branch sharing of a shingle-set relation (the band
    self-join reads it via mh on both sides AND verification re-reads
    it) — NOT cross-run result caching; the relation lives and dies
    inside one query execution.

    StorageLevel pinned explicitly (VERDICT r12 #5): MEMORY_AND_DISK —
    identical to what `.cache()` defaults to, stated here because the
    relation is corpus-sized at 100 TB, so the spill story must be
    explicit: partitions that exceed executor storage memory spill to
    local disk instead of OOMing or silently recomputing the shingle
    scan per branch. It is never broadcast and never collected."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)

P = 1_000_000_007
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = 4
SEEDS = [(2 * k + 3, 104_729 * k + 12_345) for k in range(N_HASHES)]
JACCARD_THRESHOLD = 0.8


def hex12_sql(col: str) -> str:
    """SQL computing int(first 12 hex chars of `col`) — identical text
    runs on Spark SQL and DuckDB (instr/substring agree)."""
    # CAST the power to BIGINT: small powers would otherwise stay INT32
    # and overflow under Spark's ANSI arithmetic.
    terms = " + ".join(
        f"(instr('0123456789abcdef', substring({col}, {j}, 1)) - 1) * CAST({16 ** (12 - j)} AS BIGINT)"
        for j in range(1, 13)
    )
    return f"({terms})"


@query(
    "q_dedup_exact",
    """
    SELECT lang, source,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           count(*) - count(DISTINCT md5(text)) AS n_exact_dups
    FROM documents
    GROUP BY lang, source
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate accounting per corpus slice (hash group-by on the
    full text; at scale the md5 replaces shuffling raw documents)."""
    return (
        t(spark, sf_dir, "documents")
        .select("lang", "source", F.md5(F.col("text")).alias("h"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_exact_dups"),
        )
    )


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> one row per doc: (doc_id, hvs = set of 48-bit
    shingle hashes as array<long>).

    Spark computes the 48-bit value with native conv(hex, 16, 10) —
    bit-identical to the oracle's instr/substring arithmetic (both are
    "int of the first 12 hex chars of md5") but one intrinsic instead
    of a 12-term string-search chain (measured ~2x on the shingle
    stage). `collect_set` both deduplicates AND co-locates each doc's
    shingle set in ONE shuffle keyed on doc_id (8-byte longs on the
    wire, never shingle strings) — the previous distinct-then-groupBy
    form paid two full-width shuffles for the same result. A 48-bit
    collision collapsing two shingles would change min/count
    identically on both engines (P(collision) ~ 2^-48 per doc).

    Scale bound: the per-doc array is O(doc tokens) longs (~80 KB for a
    10k-token doc) — rows stay well under shuffle block limits."""
    return _shingle_sets_of(t(spark, sf_dir, "documents"))


def _shingle_sets_of(frame: DataFrame) -> DataFrame:
    """`_shingle_sets` over an arbitrary (doc_id, text, ...) frame —
    lets snapshot/batch constructions reuse the one-shuffle shingle-set
    build on synthesized corpora (q_dedup_snapshot_minhash)."""
    docs = frame.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 3)
    shingle_expr = (
        "transform(sequence(1, size(toks) - 2), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))"
    )
    return (
        docs.select("doc_id", F.explode(F.expr(shingle_expr)).alias("sg"))
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("sg"), 1, 12), 16, 10).cast("long").alias("hv"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("hv").alias("hvs"))
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> distinct (doc_id, shingle-hash) rows, derived from
    `_shingle_sets` so downstream doc_id-keyed aggregations (simhash
    votes) reuse the collect_set exchange: the explode is narrow and
    PRESERVES hash(doc_id) partitioning, so a following
    groupBy('doc_id') needs no new shuffle (the old distinct form was
    partitioned on (doc_id, hv) and always re-shuffled)."""
    return _shingle_sets(spark, sf_dir).select("doc_id", F.explode("hvs").alias("hv"))


def _minhash_set_cols():
    """Per-permutation minimum over the hvs array — a NARROW map over
    the collect_set rows (no shuffle; the old per-row agg form needed
    its own groupBy exchange).

    r12: built as parsed SQL strings instead of python-lambda
    `F.transform` columns — the 16 lambda conversions cost ~0.2 s of
    py4j round trips per DataFrame build (measured, guide §1), while
    one `F.expr` per column parses to the IDENTICAL Catalyst
    expression (same transform/array_min tree, same literals)."""
    return [
        F.expr(f"array_min(transform(hvs, x -> ({a}L * x + {b}L) % {P}L))").alias(
            f"m{k}"
        )
        for k, (a, b) in enumerate(SEEDS)
    ]


_ORACLE_MINHASH_COLS = ",\n           ".join(
    f"min(({a} * hv + {b}) % {P}) AS m{k}" for k, (a, b) in enumerate(SEEDS)
)
_ORACLE_BANDS = "\n      UNION ALL\n      ".join(
    "SELECT doc_id, {band} AS band, concat_ws(',', {cols}) AS bkey FROM mh".format(
        band=band,
        cols=", ".join(f"m{band * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)),
    )
    for band in range(N_BANDS)
)

_MINHASH_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS s FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, sg FROM (
        SELECT doc_id,
               unnest(list_transform(s[1:len(s)-2],
                                     (x, i) -> concat(x, ' ', s[i+1], ' ', s[i+2]))) AS sg
        FROM docs) u
    ),
    hv AS (SELECT doc_id, sg, {hex12_sql("md5(sg)")} AS hv FROM sh),
    mh AS (
      SELECT doc_id,
           {_ORACLE_MINHASH_COLS}
      FROM hv GROUP BY doc_id
    ),
    bands AS (
      {_ORACLE_BANDS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    shd AS (SELECT DISTINCT doc_id, hv FROM hv),
    sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand c
      JOIN shd x ON x.doc_id = c.doc_a
      JOIN shd y ON y.doc_id = c.doc_b AND y.hv = x.hv
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b, i.n_common,
           sa.n AS n_a, sb.n AS n_b,
           i.n_common / (sa.n + sb.n - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE i.n_common / (sa.n + sb.n - i.n_common) >= {JACCARD_THRESHOLD}
"""


@query("q_dedup_minhash", _MINHASH_ORACLE)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH (16 hashes, 4 bands x 4),
    verified with exact shingle-set Jaccard >= 0.8.

    Shuffle inventory (the whole point of this shape): ONE wide
    exchange builds the per-doc shingle sets; signatures and band keys
    are narrow maps over it; the band self-join + candidate distinct
    shuffle only (doc_id, band-key) rows; verification joins the
    candidate pairs back to the cached sets and intersects ARRAYS
    per-pair (`array_intersect`) — no exploded-row shuffle at all.
    Candidate side is tiny relative to the corpus, so AQE turns those
    two joins into broadcasts at runtime."""
    # Cached because bands reference it via mh on both sides of the
    # self-join AND the verification joins re-read it: without the
    # cache the shingle scan re-executes once per plan branch.
    sets = _persist_sets(_shingle_sets(spark, sf_dir))
    mh = sets.select("doc_id", *_minhash_set_cols())

    # One posexplode emits all 4 band keys per doc in a single pass over
    # mh (the 4-way union form evaluated mh once per branch).
    bands = mh.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[F.col(f"m{band * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                    )
                    for band in range(N_BANDS)
                ]
            )
        ).alias("band", "bkey"),
    )

    b2 = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"), F.col("bkey").alias("bkey_b")
    )
    cand = (
        bands.join(
            b2,
            (F.col("band") == F.col("band_b"))
            & (F.col("bkey") == F.col("bkey_b"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )

    # Exact verification per candidate pair: set intersection over the
    # 48-bit hashes via array_intersect on the two cached hvs arrays —
    # identical counts to the oracle's exploded join-group (both are
    # exact distinct-set intersection; hv collisions ~2^-48 hit both
    # engines identically).
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("hvs").alias("hvs_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("hvs").alias("hvs_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("hvs_a", "hvs_b")).cast("long").alias("n_common"),
            F.size("hvs_a").cast("long").alias("n_a"),
            F.size("hvs_b").cast("long").alias("n_b"),
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
    )


@query(
    "q_dedup_keep_canonical",
    """
    WITH keep AS (
      SELECT md5(text) AS h, min(doc_id) AS doc_id, count(*) AS n_copies
      FROM documents GROUP BY md5(text)
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars, k.n_copies
    FROM keep k JOIN documents d ON d.doc_id = k.doc_id
    """,
)
def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup with canonical survivor selection: one kept document
    per distinct content (lowest doc_id), annotated with its copy
    count — the materialization step that turns q_dedup_exact's report
    into the deduplicated training corpus.

    The group-by shuffles (16-byte md5, min(doc_id), count) — never
    text — and the join back to recover full rows is keyed on doc_id,
    so the corpus re-read is a broadcast-able slim side against the
    fact scan at any scale."""
    docs = t(spark, sf_dir, "documents")
    keep = (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )
    return docs.join(keep, "doc_id").select(
        "doc_id", "lang", "source", "n_chars", "n_copies"
    )


@query(
    "q_dedup_latest",
    """
    WITH ranked AS (
      SELECT event_id, user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id AS latest_event_id,
           ts AS latest_ts, value AS latest_value
    FROM ranked WHERE rn = 1
    """,
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction (the CDC/upsert read shape:
    many versions per key, serve only the newest). Deterministic
    (ts, event_id) tiebreak pins engine-independent winners.

    One keyed shuffle on (user_id, event_type); the per-key sort is
    group-local — never a global order. At 100 TB this is the compact-
    on-read plan; compact-on-write is the same query into
    sink_partitioned's layout."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
        )
    )


NEW_BATCH_MOD = 10  # doc_id % 10 >= NEW_BATCH_RESIDUE -> "incoming batch"
NEW_BATCH_RESIDUE = 8

_MERGE_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS s FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, sg FROM (
        SELECT doc_id,
               unnest(list_transform(s[1:len(s)-2],
                                     (x, i) -> concat(x, ' ', s[i+1], ' ', s[i+2]))) AS sg
        FROM docs) u
    ),
    hv AS (SELECT doc_id, sg, {hex12_sql("md5(sg)")} AS hv FROM sh),
    mh AS (
      SELECT doc_id,
           {_ORACLE_MINHASH_COLS}
      FROM hv GROUP BY doc_id
    ),
    bands AS (
      {_ORACLE_BANDS}
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM bands n JOIN bands o
        ON n.band = o.band AND n.bkey = o.bkey
      WHERE n.doc_id % {NEW_BATCH_MOD} >= {NEW_BATCH_RESIDUE}
        AND o.doc_id % {NEW_BATCH_MOD} < {NEW_BATCH_RESIDUE}
    ),
    shd AS (SELECT DISTINCT doc_id, hv FROM hv),
    sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
    inter AS (
      SELECT c.new_id, c.old_id, count(*) AS n_common
      FROM cand c
      JOIN shd x ON x.doc_id = c.new_id
      JOIN shd y ON y.doc_id = c.old_id AND y.hv = x.hv
      GROUP BY c.new_id, c.old_id
    )
    SELECT i.new_id, i.old_id, i.n_common,
           sn.n AS n_new, so.n AS n_old,
           i.n_common / (sn.n + so.n - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes sn ON sn.doc_id = i.new_id
    JOIN sizes so ON so.doc_id = i.old_id
    WHERE i.n_common / (sn.n + so.n - i.n_common) >= {JACCARD_THRESHOLD}
"""


@query("q_merge_dedup", _MERGE_ORACLE)
def q_merge_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the production topology q_dedup_minhash's
    all-pairs form does not exercise: an incoming batch (deterministic
    doc_id % 10 >= 8 slice) is checked against the already-indexed
    corpus (the rest), and only new-x-indexed band collisions become
    candidates — never indexed-x-indexed (that work happened when those
    docs were ingested) and never new-x-new (that is the intra-batch
    q_dedup_minhash pass).

    At 100 TB this is the shape that keeps daily ingest cheap: the
    corpus-side band keys are a materialized index (written once,
    partitioned by band), the new batch's bands are a narrow map over
    the batch only, and the candidate join is batch-size x collision
    rate, independent of corpus row count. Verification joins fetch
    only the colliding docs' shingle sets."""
    sets = _persist_sets(_shingle_sets(spark, sf_dir))
    mh = sets.select("doc_id", *_minhash_set_cols())
    bands = mh.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[F.col(f"m{band * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                    )
                    for band in range(N_BANDS)
                ]
            )
        ).alias("band", "bkey"),
    )
    is_new = (F.col("doc_id") % NEW_BATCH_MOD) >= NEW_BATCH_RESIDUE
    new_b = bands.filter(is_new).select(
        F.col("doc_id").alias("new_id"), "band", "bkey"
    )
    old_b = bands.filter(~is_new).select(
        F.col("doc_id").alias("old_id"),
        F.col("band").alias("band_o"),
        F.col("bkey").alias("bkey_o"),
    )
    cand = (
        new_b.join(
            old_b,
            (F.col("band") == F.col("band_o")) & (F.col("bkey") == F.col("bkey_o")),
        )
        .select("new_id", "old_id")
        .distinct()
    )
    sn = sets.select(F.col("doc_id").alias("new_id"), F.col("hvs").alias("hvs_n"))
    so = sets.select(F.col("doc_id").alias("old_id"), F.col("hvs").alias("hvs_o"))
    jac = F.col("n_common") / (F.col("n_new") + F.col("n_old") - F.col("n_common"))
    return (
        cand.join(sn, "new_id")
        .join(so, "old_id")
        .select(
            "new_id",
            "old_id",
            F.size(F.array_intersect("hvs_n", "hvs_o")).cast("long").alias("n_common"),
            F.size("hvs_n").cast("long").alias("n_new"),
            F.size("hvs_o").cast("long").alias("n_old"),
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("new_id", "old_id", "n_common", "n_new", "n_old", "jaccard")
    )


@query(
    "q_dedup_rate_by_source",
    """
    WITH h AS (SELECT source, md5(text) AS dig FROM documents),
    g AS (SELECT dig, count(*) AS c FROM h GROUP BY dig)
    SELECT h.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN g.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           CAST(sum(CASE WHEN g.c > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS dup_ppm
    FROM h JOIN g ON g.dig = h.dig
    GROUP BY h.source
    """,
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-rate monitoring per ingestion source: the share of
    each source's documents whose exact text digest appears more than
    once ANYWHERE in the corpus (cross-source duplicates count against
    every source carrying them) — the attribution readout that tells
    you WHICH feed is pumping copies before you pay to dedup them.
    q_dedup_exact finds the duplicates; this key turns them into a
    per-source rate in exact ppm.

    Scale shape: one digest rollup (16-byte md5 keys, map-side
    combined), one equi-join of docs against the digest-count table on
    the digest (the dup side is duplicate-cardinality-sized and
    usually broadcastable), one source-keyed aggregate. Text never
    shuffles — only digests."""
    h = t(spark, sf_dir, "documents").select(
        "source", F.md5(F.col("text").cast("binary")).alias("dig")
    )
    g = h.groupBy("dig").agg(F.count(F.lit(1)).alias("c"))
    dup = F.when(F.col("c") > 1, 1).otherwise(0)
    return (
        h.join(g, "dig")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dup).cast("long").alias("n_dup_docs"),
            F.expr(
                "CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) * 1000000"
                " DIV count(*) AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


# Deterministic fixed-SIZE doc panel for the recall harness: order the
# eligible docs by the portable hash of doc_id (tie-break doc_id) and
# keep the first RECALL_SAMPLE_N. A fixed FRACTION would still grow the
# exact truth join quadratically with the corpus; a fixed-size panel
# pins the quadratic part regardless of corpus scale (the
# q_sim_recall_report fixed-eval-set recipe).
RECALL_SAMPLE_N = 1024

_RECALL_DEDUP_ORACLE = f"""
    WITH docs0 AS (
      SELECT doc_id, string_split(text, ' ') AS s FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    panel AS (
      SELECT doc_id FROM docs0
      ORDER BY {hex12_sql("md5(CAST(doc_id AS VARCHAR))")}, doc_id
      LIMIT {RECALL_SAMPLE_N}
    ),
    docs AS (
      SELECT d.doc_id, d.s FROM docs0 d JOIN panel p ON p.doc_id = d.doc_id
    ),
    sh AS (
      SELECT DISTINCT doc_id, sg FROM (
        SELECT doc_id,
               unnest(list_transform(s[1:len(s)-2],
                                     (x, i) -> concat(x, ' ', s[i+1], ' ', s[i+2]))) AS sg
        FROM docs) u
    ),
    hv AS (SELECT doc_id, sg, {hex12_sql("md5(sg)")} AS hv FROM sh),
    mh AS (
      SELECT doc_id,
           {_ORACLE_MINHASH_COLS}
      FROM hv GROUP BY doc_id
    ),
    bands AS (
      {_ORACLE_BANDS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    shd AS (SELECT DISTINCT doc_id, hv FROM hv),
    sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
    ti AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_common
      FROM shd x JOIN shd y ON y.hv = x.hv AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT t.doc_a, t.doc_b FROM ti t
      JOIN sizes sa ON sa.doc_id = t.doc_a
      JOIN sizes sb ON sb.doc_id = t.doc_b
      WHERE t.n_common / (sa.n + sb.n - t.n_common) >= {JACCARD_THRESHOLD}
    ),
    hits AS (
      SELECT c.doc_a FROM cand c
      JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    )
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth_pairs,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidate_pairs,
           CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
           CAST((SELECT count(*) FROM hits) * 1000000
                // nullif((SELECT count(*) FROM truth), 0) AS BIGINT)
             AS recall_ppm,
           CAST((SELECT count(*) FROM hits) * 1000000
                // nullif((SELECT count(*) FROM cand), 0) AS BIGINT)
             AS precision_ppm
"""


@query("q_dedup_recall_report", _RECALL_DEDUP_ORACLE, eval_tier=True)
def q_dedup_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL TIER — candidate-quality report for MinHash-LSH dedup,
    computed on a deterministic fixed-size doc panel ({RECALL_SAMPLE_N}
    docs, hash-ordered): ground truth is EVERY panel pair with exact
    shingle-set Jaccard >= {JACCARD_THRESHOLD} (computed via the
    shared-shingle posting join — a pair with no common shingle cannot
    pass the threshold, so the join IS exhaustive within the panel),
    candidates are the {N_BANDS}x{ROWS_PER_BAND} LSH band collisions
    among panel docs, and the report gives band recall (truth pairs
    the bands surfaced) and precision (band pairs that verify) in
    exact ppm. The dedup sibling of q_sim_recall_report:
    q_dedup_minhash ships the operator, this key measures what its
    pruning costs — the number you tune bands/rows against before a
    100 TB run.

    Scale shape: the panel cap is IN the code, not just a docstring
    promise — a naive invocation on a 100 TB corpus still only runs
    the exact truth join on {RECALL_SAMPLE_N} docs (the posting-list
    quadratic is pinned; only the panel-selection TakeOrdered scans
    the corpus). One shingle exchange feeds both sides past the cap.
    Output is one row of exact counts and floor-divided ppm."""
    sets_all = _shingle_sets(spark, sf_dir)
    hk = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        .alias("hk")
    )
    # orderBy.limit executes as TakeOrderedAndProject — per-partition
    # heaps, no global sort of the corpus.
    panel = (
        sets_all.select("doc_id", hk)
        .orderBy("hk", "doc_id")
        .limit(RECALL_SAMPLE_N)
        .select("doc_id")
    )
    sets = _persist_sets(sets_all.join(F.broadcast(panel), "doc_id"))
    mh = sets.select("doc_id", *_minhash_set_cols())
    bands = mh.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{band * ROWS_PER_BAND + r}")
                            for r in range(ROWS_PER_BAND)
                        ],
                    )
                    for band in range(N_BANDS)
                ]
            )
        ).alias("band", "bkey"),
    )
    b2 = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band_b"),
        F.col("bkey").alias("bkey_b"),
    )
    cand = (
        bands.join(
            b2,
            (F.col("band") == F.col("band_b"))
            & (F.col("bkey") == F.col("bkey_b"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    shd = sets.select("doc_id", F.explode("hvs").alias("hv"))
    sizes = sets.select("doc_id", F.size("hvs").cast("long").alias("n"))
    ti = (
        shd.join(
            shd.select(F.col("doc_id").alias("doc_b"), "hv"),
            ["hv"],
        )
        .where(F.col("doc_id") < F.col("doc_b"))
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    truth = (
        ti.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .where(
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            >= JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b")
    )
    hits = cand.join(truth, ["doc_a", "doc_b"])
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth_pairs"))
    nc = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"))
    nh = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    return (
        nt.crossJoin(nc)
        .crossJoin(nh)
        .select(
            "n_truth_pairs",
            "n_candidate_pairs",
            "n_hits",
            F.expr(
                "CAST(n_hits * 1000000 DIV nullif(n_truth_pairs, 0) AS BIGINT)"
            ).alias("recall_ppm"),
            F.expr(
                "CAST(n_hits * 1000000 DIV nullif(n_candidate_pairs, 0) AS BIGINT)"
            ).alias("precision_ppm"),
        )
    )


_MIX_OVERLAP_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id, source, string_split(text, ' ') AS s FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT source, {hex12_sql("md5(sg)")} AS hv FROM (
        SELECT source,
               unnest(list_transform(s[1:len(s)-2],
                                     (x, i) -> concat(x, ' ', s[i+1], ' ', s[i+2]))) AS sg
        FROM docs) u
    ),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh
              GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b ON b.hv = a.hv AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_common,
           sa.n AS n_a, sb.n AS n_b,
           CAST(i.n_common * 1000000 // (sa.n + sb.n - i.n_common) AS BIGINT)
             AS jaccard_ppm,
           CAST(i.n_common * 1000000 // least(sa.n, sb.n) AS BIGINT)
             AS containment_ppm
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
"""


@query("q_mix_overlap", _MIX_OVERLAP_ORACLE)
def q_mix_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle-overlap matrix: for every source pair, the
    exact 3-gram shingle-set intersection with Jaccard and (Broder)
    containment in exact ppm — the corpus-level contamination map you
    consult before fixing mixture weights (two heavily-overlapping
    sources double-count their shared text; q_text_decontam removes
    KNOWN benchmark overlap, this key DISCOVERS pairwise overlap).
    Per-doc near-dup work stays in the dedup keys; this is the
    source-granularity rollup.

    Scale shape: one (source, shingle) distinct aggregate (the shingle
    exchange all dedup keys share), then a posting-list self-join
    keyed on the shingle hash — per-shingle work is (sources holding
    it choose 2), bounded by the SOURCE alphabet squared, never by
    corpus size — and a broadcast size join. All exact integers."""
    sh = (
        _shingle_sets(spark, sf_dir)
        .join(
            t(spark, sf_dir, "documents").select("doc_id", "source"), "doc_id"
        )
        .select("source", F.explode("hvs").alias("hv"))
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        sh.join(
            sh.select(F.col("source").alias("src_b"), "hv"), "hv"
        )
        .where(F.col("source") < F.col("src_b"))
        .groupBy(F.col("source").alias("src_a"), "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_common * 1000000 DIV (n_a + n_b - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
            F.expr(
                "CAST(n_common * 1000000 DIV least(n_a, n_b) AS BIGINT)"
            ).alias("containment_ppm"),
        )
    )


# --- MinHash banding tuning curve (round 9) ------------------------------

# (n_bands, rows_per_band) sweeps over the SAME 16 permutations; the
# shipped operator's config (4, 4) sits in the middle of the S-curve.
BAND_TUNE_CONFIGS = ((8, 2), (4, 4), (2, 8))


def _band_tune_bands_sql() -> str:
    frags = []
    for nb, rpb in BAND_TUNE_CONFIGS:
        for band in range(nb):
            cols = ", ".join(f"m{band * rpb + r}" for r in range(rpb))
            frags.append(
                f"SELECT doc_id, {nb} AS nb, {band} AS band,"
                f" concat_ws(',', {cols}) AS bkey FROM mh"
            )
    return "\n      UNION ALL\n      ".join(frags)


_BAND_TUNE_ORACLE = f"""
    WITH docs0 AS (
      SELECT doc_id, string_split(text, ' ') AS s FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    panel AS (
      SELECT doc_id FROM docs0
      ORDER BY {hex12_sql("md5(CAST(doc_id AS VARCHAR))")}, doc_id
      LIMIT {RECALL_SAMPLE_N}
    ),
    docs AS (
      SELECT d.doc_id, d.s FROM docs0 d JOIN panel p ON p.doc_id = d.doc_id
    ),
    sh AS (
      SELECT DISTINCT doc_id, sg FROM (
        SELECT doc_id,
               unnest(list_transform(s[1:len(s)-2],
                                     (x, i) -> concat(x, ' ', s[i+1], ' ', s[i+2]))) AS sg
        FROM docs) u
    ),
    hv AS (SELECT doc_id, sg, {hex12_sql("md5(sg)")} AS hv FROM sh),
    mh AS (
      SELECT doc_id,
           {_ORACLE_MINHASH_COLS}
      FROM hv GROUP BY doc_id
    ),
    bands AS (
      {{bands}}
    ),
    cand AS (
      SELECT DISTINCT a.nb, a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.nb = b.nb AND a.band = b.band AND a.bkey = b.bkey
       AND a.doc_id < b.doc_id
    ),
    shd AS (SELECT DISTINCT doc_id, hv FROM hv),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shd GROUP BY doc_id),
    ti AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM shd x JOIN shd y ON y.hv = x.hv AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT t.doc_a, t.doc_b
      FROM ti t
      JOIN sizes sa ON sa.doc_id = t.doc_a
      JOIN sizes sb ON sb.doc_id = t.doc_b
      WHERE t.n_common / (sa.n + sb.n - t.n_common) >= {JACCARD_THRESHOLD}
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
    nc AS (SELECT nb, CAST(count(*) AS BIGINT) AS n_cand FROM cand GROUP BY nb),
    nh AS (
      SELECT c.nb, CAST(count(*) AS BIGINT) AS n_hits
      FROM cand c JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
      GROUP BY c.nb
    ),
    spine AS (
      SELECT * FROM (VALUES {", ".join(f"({nb}, {rpb})" for nb, rpb in BAND_TUNE_CONFIGS)})
        v(n_bands, rows_per_band)
    )
    SELECT CAST(s.n_bands AS INTEGER) AS n_bands,
           CAST(s.rows_per_band AS INTEGER) AS rows_per_band,
           nt.n_truth,
           CAST(coalesce(nc.n_cand, 0) AS BIGINT) AS n_cand,
           CAST(coalesce(nh.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(coalesce(nh.n_hits, 0) * 1000000 // nullif(nt.n_truth, 0)
             AS BIGINT) AS recall_ppm,
           CAST(coalesce(nh.n_hits, 0) * 1000000 // nullif(nc.n_cand, 0)
             AS BIGINT) AS precision_ppm
    FROM spine s
    CROSS JOIN nt
    LEFT JOIN nc ON nc.nb = s.n_bands
    LEFT JOIN nh ON nh.nb = s.n_bands
""".replace("{bands}", _band_tune_bands_sql())


@query("q_dedup_band_tune", _BAND_TUNE_ORACLE, eval_tier=True)
def q_dedup_band_tune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL TIER — MinHash banding TUNING CURVE: recall and precision
    of the LSH candidate filter for (bands x rows) in
    {BAND_TUNE_CONFIGS} over the SAME 16 permutations, against the
    exact-Jaccard>={JACCARD_THRESHOLD} truth on the fixed
    {RECALL_SAMPLE_N}-doc panel. This is the dedup S-curve instrument
    that completes the tuning-tool family (q_sim_ann_tune picks IVF's
    N_PROBE, q_sim_ann_multiprobe widens LSH buckets, THIS picks
    bands/rows before a 100 TB dedup run): more bands with fewer rows
    (8x2) collides aggressively — high recall, low precision; fewer
    wider bands (2x8) barely collides — the curve shows where the
    shipped (4x4) config sits and what a threshold change would cost.

    One-pass efficiency: the 16 minhash values are computed ONCE and
    re-banded per config (banding is a projection, never a rescan);
    the exact truth join is computed once and shared by all three
    rows; the panel cap is in the code, so corpus growth cannot grow
    the quadratic part (the q_dedup_recall_report guarantee).

    Determinism: candidates are exact integer band-key collisions;
    truth reuses the recall report's expression verbatim; zero-
    coalesced spine keeps configs with no collisions (precision NULL
    by nullif, identically on both engines)."""
    sets_all = _shingle_sets(spark, sf_dir)
    hk = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        .alias("hk")
    )
    panel = (
        sets_all.select("doc_id", hk)
        .orderBy("hk", "doc_id")
        .limit(RECALL_SAMPLE_N)
        .select("doc_id")
    )
    sets = _persist_sets(sets_all.join(F.broadcast(panel), "doc_id"))
    mh = sets.select("doc_id", *_minhash_set_cols())

    # r12 (guide §2.4): all three configs' band keys come from the SAME
    # 16 minhash columns, so they explode in ONE pass over mh — the old
    # per-config union re-derived the mh projection three times and
    # tripled the analysis/codegen surface. Rows (doc_id, nb, band,
    # bkey) are identical; downstream joins/groupBys are order-free.
    entries = [
        F.struct(
            F.lit(nb).alias("nb"),
            F.lit(band).alias("band"),
            F.concat_ws(
                ",", *[F.col(f"m{band * rpb + r}") for r in range(rpb)]
            ).alias("bkey"),
        )
        for nb, rpb in BAND_TUNE_CONFIGS
        for band in range(nb)
    ]
    bands = mh.select(
        "doc_id", F.explode(F.array(*entries)).alias("e")
    ).select("doc_id", "e.nb", "e.band", "e.bkey")
    b2 = bands.select(
        F.col("nb").alias("nb_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band_b"),
        F.col("bkey").alias("bkey_b"),
    )
    cand = (
        bands.join(
            b2,
            (F.col("nb") == F.col("nb_b"))
            & (F.col("band") == F.col("band_b"))
            & (F.col("bkey") == F.col("bkey_b"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .select("nb", F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    shd = sets.select("doc_id", F.explode("hvs").alias("hv"))
    sizes = sets.select("doc_id", F.size("hvs").cast("long").alias("n"))
    ti = (
        shd.join(shd.select(F.col("doc_id").alias("doc_b"), "hv"), ["hv"])
        .where(F.col("doc_id") < F.col("doc_b"))
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    truth = (
        ti.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            "doc_b",
        )
        .where(
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            >= JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b")
    )
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    nc = cand.groupBy("nb").agg(F.count(F.lit(1)).cast("long").alias("n_cand"))
    nh = (
        cand.join(truth, ["doc_a", "doc_b"])
        .groupBy("nb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    spine = spark.createDataFrame(
        list(BAND_TUNE_CONFIGS), "n_bands int, rows_per_band int"
    )
    return (
        spine.crossJoin(F.broadcast(nt))
        .join(F.broadcast(nc), F.col("n_bands") == F.col("nb"), "left")
        .drop("nb")
        .join(F.broadcast(nh), F.col("n_bands") == F.col("nb"), "left")
        .drop("nb")
        .select(
            "n_bands",
            "rows_per_band",
            "n_truth",
            F.coalesce(F.col("n_cand"), F.lit(0)).cast("long").alias("n_cand"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.expr(
                "CAST(coalesce(n_hits, 0) * 1000000 DIV nullif(n_truth, 0)"
                " AS BIGINT)"
            ).alias("recall_ppm"),
            F.expr(
                "CAST(coalesce(n_hits, 0) * 1000000 DIV nullif(n_cand, 0)"
                " AS BIGINT)"
            ).alias("precision_ppm"),
        )
    )


# --- cross-snapshot incremental dedup census (round 11) --------------------

SNAP_DELTA_SHIFT = 1_000_000_000  # new-id offset, q_snapshot_diff's convention
_SD_BUCKET_DUCK = f"({hex12_sql('md5(CAST(doc_id AS VARCHAR))')} % 100)"
_SD_BUCKET_SPARK = f"({hex12_sql('md5(cast(doc_id as string))')} % 100)"

_SNAP_DELTA_ORACLE = f"""
    WITH b AS (
      SELECT doc_id, text, source, {_SD_BUCKET_DUCK} AS bk FROM documents
    ),
    carried AS (
      SELECT doc_id, source,
             CASE WHEN bk BETWEEN 5 AND 14 THEN text || ' v2' ELSE text END
               AS text
      FROM b WHERE bk >= 5
    ),
    added AS (
      SELECT doc_id + {SNAP_DELTA_SHIFT} AS doc_id, source,
             CASE WHEN bk < 95 THEN text || ' u2' ELSE text END AS text
      FROM b WHERE bk >= 90
    ),
    oldh AS (SELECT DISTINCT md5(text) AS h FROM carried),
    ac AS (
      SELECT a.source,
             CAST(count(*) AS BIGINT) AS n_added,
             CAST(count(o.h) AS BIGINT) AS n_dup_prior
      FROM added a LEFT JOIN oldh o ON md5(a.text) = o.h
      GROUP BY a.source
    ),
    cc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_carried
           FROM carried GROUP BY source)
    SELECT cc.source,
           cc.n_carried,
           CAST(coalesce(ac.n_added, 0) AS BIGINT) AS n_added,
           CAST(coalesce(ac.n_dup_prior, 0) AS BIGINT) AS n_dup_prior,
           CAST(coalesce(ac.n_added - ac.n_dup_prior, 0) AS BIGINT) AS n_fresh,
           CAST(coalesce(ac.n_dup_prior, 0) * 1000000
                // nullif(coalesce(ac.n_added, 0), 0) AS BIGINT) AS dup_ppm
    FROM cc LEFT JOIN ac ON ac.source = cc.source
"""


@query("q_dedup_snapshot_delta", _SNAP_DELTA_ORACLE)
def q_dedup_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot INCREMENTAL exact-dedup census — the lakehouse
    loop closure between q_snapshot_diff (keyed change feed) and
    q_merge_dedup (near-dup of an incoming batch): when a new corpus
    snapshot lands, which of its ADDED documents carry content that the
    LIVE snapshot already holds under a different id (the crawler
    re-fetch / re-ingest duplicate — the exact-duplicate class Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better", measures first), and which are genuinely fresh.

    Snapshot B is the deterministic pure-function-of-doc_id transform
    (q_snapshot_diff's convention, same md5-bucket): bucket < 5
    deleted, 5-14 edited (text || ' v2'), and the bucket >= 90 slice
    RE-INGESTED under doc_id + {SNAP_DELTA_SHIFT} — verbatim for
    bucket >= 95 (true re-fetch duplicates) and with changed content
    (text || ' u2') for 90-94 (pages that changed between crawls).
    The census classifies every added id against the carried (live,
    post-edit) content-hash set — NOT against stale pre-edit hashes,
    which is exactly the index-maintenance discipline an incremental
    lakehouse dedup needs. Per source: carried/added counts, how many
    adds duplicate prior content, fresh count, and the duplicate rate
    (ppm, nullif-guarded for sources with no adds).

    Exactness: md5 content digests, exact BIGINT counts, one ppm floor
    — hash-green.

    Scale shape (the 100 TB argument): the carried content-hash set is
    the maintained exact-dedup INDEX of the live snapshot (at rest:
    written bucketed by digest, q_dedup_exact's layout) — corpus-sized,
    so it is NEVER broadcast (the r9 lesson): the added batch joins it
    keyed on digest, batch-size x 1 lookups on a co-located layout, AQE
    free to pick the strategy at fixture scale. Everything else is
    narrow maps + map-side-combined per-source counts. Ingest cost is
    O(batch), independent of corpus row count."""
    bk = F.expr(_SD_BUCKET_SPARK)
    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "source", bk.alias("bk"))
    carried = docs.filter(F.col("bk") >= 5).select(
        "doc_id",
        "source",
        F.when(
            F.col("bk").between(5, 14), F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    added = docs.filter(F.col("bk") >= 90).select(
        (F.col("doc_id") + SNAP_DELTA_SHIFT).alias("doc_id"),
        "source",
        F.when(
            F.col("bk") < 95, F.concat(F.col("text"), F.lit(" u2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    # The live snapshot's content-hash index: corpus-sized -> never
    # broadcast; keyed join, AQE decides the physical strategy.
    oldh = carried.select(F.md5("text").alias("h")).distinct()
    ac = (
        added.join(oldh, F.md5(added["text"]) == oldh["h"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_added"),
            F.count("h").cast("long").alias("n_dup_prior"),
        )
    )
    cc = carried.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_carried")
    )
    return cc.join(ac, "source", "left").select(
        "source",
        "n_carried",
        F.coalesce("n_added", F.lit(0)).cast("long").alias("n_added"),
        F.coalesce("n_dup_prior", F.lit(0)).cast("long").alias("n_dup_prior"),
        F.coalesce(F.col("n_added") - F.col("n_dup_prior"), F.lit(0))
        .cast("long")
        .alias("n_fresh"),
        F.expr(
            "CAST(coalesce(n_dup_prior, 0) * 1000000"
            " DIV nullif(coalesce(n_added, 0), 0) AS BIGINT)"
        ).alias("dup_ppm"),
    )


# --- cross-snapshot incremental NEAR-dup (round 12) -------------------------

_SNAP_MH_ORACLE = f"""
    WITH b AS (
      SELECT doc_id, text, source, {_SD_BUCKET_DUCK} AS bk FROM documents
    ),
    snap AS (
      SELECT doc_id, source,
             CASE WHEN bk BETWEEN 5 AND 14 THEN text || ' v2' ELSE text END
               AS text
      FROM b WHERE bk >= 5
      UNION ALL
      SELECT doc_id + {SNAP_DELTA_SHIFT} AS doc_id, source,
             CASE WHEN bk < 95 THEN text || ' u2' ELSE text END AS text
      FROM b WHERE bk >= 90
    ),
    docs AS (
      SELECT doc_id, source, string_split(text, ' ') AS s FROM snap
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, sg FROM (
        SELECT doc_id,
               unnest(list_transform(s[1:len(s)-2],
                                     (x, i) -> concat(x, ' ', s[i+1], ' ', s[i+2]))) AS sg
        FROM docs) u
    ),
    hv AS (SELECT doc_id, sg, {hex12_sql("md5(sg)")} AS hv FROM sh),
    mh AS (
      SELECT doc_id,
           {_ORACLE_MINHASH_COLS}
      FROM hv GROUP BY doc_id
    ),
    bands AS (
      {_ORACLE_BANDS}
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM bands n JOIN bands o
        ON n.band = o.band AND n.bkey = o.bkey
      WHERE n.doc_id >= {SNAP_DELTA_SHIFT} AND o.doc_id < {SNAP_DELTA_SHIFT}
    ),
    shd AS (SELECT DISTINCT doc_id, hv FROM hv),
    sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
    inter AS (
      SELECT c.new_id, c.old_id, count(*) AS n_common
      FROM cand c
      JOIN shd x ON x.doc_id = c.new_id
      JOIN shd y ON y.doc_id = c.old_id AND y.hv = x.hv
      GROUP BY c.new_id, c.old_id
    ),
    ver AS (
      SELECT DISTINCT i.new_id
      FROM inter i
      JOIN sizes sn ON sn.doc_id = i.new_id
      JOIN sizes so ON so.doc_id = i.old_id
      WHERE i.n_common / (sn.n + so.n - i.n_common) >= {JACCARD_THRESHOLD}
    ),
    ad AS (SELECT doc_id, source FROM docs WHERE doc_id >= {SNAP_DELTA_SHIFT})
    SELECT ad.source,
           CAST(count(*) AS BIGINT) AS n_added,
           CAST(count(ver.new_id) AS BIGINT) AS n_near_prior,
           CAST(count(*) - count(ver.new_id) AS BIGINT) AS n_fresh,
           CAST(count(ver.new_id) * 1000000 // count(*) AS BIGINT) AS near_ppm
    FROM ad LEFT JOIN ver ON ver.new_id = ad.doc_id
    GROUP BY ad.source
"""


@query("q_dedup_snapshot_minhash", _SNAP_MH_ORACLE)
def q_dedup_snapshot_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental NEAR-dup census — the MinHash twin of
    q_dedup_snapshot_delta (VERDICT r11 #8's named gap): when snapshot B
    lands, which ADDED documents are near-duplicates (shingle Jaccard
    >= {JACCARD_THRESHOLD}) of content the LIVE snapshot already holds.
    Exact-hash snapshot dedup catches only verbatim re-fetches; this
    catches the re-crawled page whose text drifted (boilerplate
    timestamp, appended update) — the incremental half of Lee et al.
    2022's NearDup pass, composed from q_merge_dedup's band topology
    and q_snapshot_diff's deterministic snapshot-B convention.

    Snapshot B is q_dedup_snapshot_delta's exact construction (same
    md5-bucket: bucket < 5 deleted, 5-14 edited ' v2', bucket >= 90
    re-ingested under doc_id + SNAP_DELTA_SHIFT — verbatim for >= 95,
    content-drifted ' u2' for 90-94). The drifted re-ingests are
    invisible to the exact-hash delta census but land here: a 3-token
    shingle change moves Jaccard only slightly on fixture-length docs.

    Exactness: the full deterministic MinHash-LSH pipeline (fixed
    seeds, portable 48-bit md5 hashes) runs identically on both
    engines, then exact Jaccard verification — hash-green including
    LSH's probabilistic recall. Census output: per source, how many
    added docs near-duplicate prior content vs are fresh (ppm exact
    floor; the per-source group always has n_added >= 1 rows so the
    divide needs no guard).

    Scale shape (the 100 TB argument): the carried side's band keys are
    the maintained LSH INDEX of the live snapshot (at rest: written
    partitioned by band key, q_merge_dedup's layout) — corpus-sized, so
    NEVER broadcast; the added batch's bands are a narrow map over the
    batch, the candidate join is batch-size x collision-rate keyed on
    (band, bkey), and verification fetches only colliding docs' shingle
    sets. Ingest cost is O(batch), independent of corpus row count —
    the q_dedup_snapshot_delta argument with band keys in place of
    content hashes."""
    bk = F.expr(_SD_BUCKET_SPARK)
    b = t(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", bk.alias("bk")
    )
    carried = b.filter(F.col("bk") >= 5).select(
        "doc_id",
        "source",
        F.when(
            F.col("bk").between(5, 14), F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    added = b.filter(F.col("bk") >= 90).select(
        (F.col("doc_id") + SNAP_DELTA_SHIFT).alias("doc_id"),
        "source",
        F.when(
            F.col("bk") < 95, F.concat(F.col("text"), F.lit(" u2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    # One shingle-set build over the whole snapshot (cached: the band
    # join reads it via mh on both sides and verification re-reads it).
    sets = _persist_sets(_shingle_sets_of(carried.unionByName(added)))
    mh = sets.select("doc_id", *_minhash_set_cols())
    bands = mh.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{band * ROWS_PER_BAND + r}")
                            for r in range(ROWS_PER_BAND)
                        ],
                    )
                    for band in range(N_BANDS)
                ]
            )
        ).alias("band", "bkey"),
    )
    new_b = bands.filter(F.col("doc_id") >= SNAP_DELTA_SHIFT).select(
        F.col("doc_id").alias("new_id"), "band", "bkey"
    )
    # The live snapshot's LSH band index: corpus-sized -> never
    # broadcast; keyed join, AQE decides the physical strategy.
    old_b = bands.filter(F.col("doc_id") < SNAP_DELTA_SHIFT).select(
        F.col("doc_id").alias("old_id"),
        F.col("band").alias("band_o"),
        F.col("bkey").alias("bkey_o"),
    )
    cand = (
        new_b.join(
            old_b,
            (F.col("band") == F.col("band_o"))
            & (F.col("bkey") == F.col("bkey_o")),
        )
        .select("new_id", "old_id")
        .distinct()
    )
    sn = sets.select(F.col("doc_id").alias("new_id"), F.col("hvs").alias("hvs_n"))
    so = sets.select(F.col("doc_id").alias("old_id"), F.col("hvs").alias("hvs_o"))
    jac = F.col("n_common") / (F.col("n_new") + F.col("n_old") - F.col("n_common"))
    ver = (
        cand.join(sn, "new_id")
        .join(so, "old_id")
        .select(
            "new_id",
            F.size(F.array_intersect("hvs_n", "hvs_o")).cast("long").alias("n_common"),
            F.size("hvs_n").cast("long").alias("n_new"),
            F.size("hvs_o").cast("long").alias("n_old"),
        )
        .filter(jac >= JACCARD_THRESHOLD)
        .select("new_id")
        .distinct()
    )
    ad = added.filter(F.size(F.split(F.col("text"), " ")) >= 3).select(
        "doc_id", "source"
    )
    return (
        ad.join(ver, ad["doc_id"] == ver["new_id"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_added"),
            F.count("new_id").cast("long").alias("n_near_prior"),
            (F.count(F.lit(1)) - F.count("new_id")).cast("long").alias("n_fresh"),
            F.expr(
                "CAST(count(new_id) * 1000000 DIV count(1) AS BIGINT)"
            ).alias("near_ppm"),
        )
    )
