"""Binary-column (multimodal) pipeline keys — see jsmr_spark/multimodal.py.

Oracle strategy (round 3): the synthesized blobs are md5 chains, and
DuckDB can recompute every pixel byte from the hex digest (hex-pair ->
int via strpos math), so the decode and frame-sample keys are now
VALUE-CHECKED end to end — the mapInPandas workers' parsed widths,
byte sums, frame splits, and resize gathers must equal what the oracle
derives purely from (text, doc_id). Cross-row averages aggregate EXACT
integer byte sums (order-independent) and divide once, never averaging
per-blob doubles. For the fixed 4x4 -> 2x2 case the nearest-neighbor
index grid reduces to the corner pixels, so even the resize is checked
against first-principles digest offsets."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsmr_spark.compat import r4
from jsmr_spark.multimodal import SCENE_CUT_THRESHOLD
from jsmr_spark.queries.common import t
from jsmr_spark.registry import query


def _hexsum_dd(hexpr: str) -> str:
    """DuckDB expression: sum of the 16 byte values of an md5 hex digest
    (hex pair -> int via strpos('0123456789abcdef', c) - 1)."""
    return (
        "list_aggregate(list_transform(range(1, 17), j -> "
        f"(strpos('0123456789abcdef', ({hexpr})[CAST(j*2-1 AS INT)]) - 1) * 16 + "
        f"(strpos('0123456789abcdef', ({hexpr})[CAST(j*2 AS INT)]) - 1)), 'sum')"
    )


_DECODE_ORACLE = f"""
    WITH bs AS (
      SELECT lang,
             {_hexsum_dd("md5(text || '0')")}
             + {_hexsum_dd("md5(text || '1')")}
             + {_hexsum_dd("md5(text || '2')")} AS byte_sum
      FROM documents
    )
    SELECT lang,
           count(*) AS n_blobs,
           59 * count(*) AS total_bytes,
           CAST(sum(byte_sum) AS BIGINT) AS pixel_value_sum,
           sum(byte_sum) / (48.0 * count(*)) AS avg_pixel_byte,
           CAST(4 AS INT) AS min_width,
           CAST(4 AS INT) AS max_height
    FROM bs GROUP BY lang
"""


@query("q_multimodal_decode", _DECODE_ORACLE)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extraction over a binary column via
    mapInPandas (real pure-Python PPM/BMP parse), aggregated per
    language — VALUE-CHECKED: the oracle independently recomputes the
    59-byte blob length (11-byte P6 header + 4x4x3 pixels), every pixel
    byte's value from the md5 chain, and the parsed dimensions, so a
    mis-parsed header or a dropped byte anywhere in the Arrow pipeline
    fails the hash. The average aggregates the exact integer byte sums
    and divides once (order-independent on both engines)."""
    from jsmr_spark.multimodal import decode_pipeline

    docs = t(spark, sf_dir, "documents")
    decoded = decode_pipeline(docs)
    return (
        decoded.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("byte_sum").alias("pixel_value_sum"),
            (F.sum("byte_sum") / F.sum("n_pixel_bytes")).alias("avg_pixel_byte"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
        )
    )


def _hexsum_idx_dd(hexpr: str, idxs: list[int]) -> str:
    """DuckDB expression: sum of SPECIFIC byte values (0-based indices)
    of an md5 hex digest."""
    terms = " + ".join(
        f"((strpos('0123456789abcdef', ({hexpr})[{2 * j + 1}]) - 1) * 16 + "
        f"(strpos('0123456789abcdef', ({hexpr})[{2 * j + 2}]) - 1))"
        for j in idxs
    )
    return f"({terms})"


# 4x4 -> 2x2 nearest neighbor keeps pixels (y,x) in {0,3}x{0,3}
# (linspace(0,3,2).round() = [0,3]); pixel (y,x) spans pixel-byte
# offsets (y*4+x)*3..+2 of the 48-byte payload = digest0 bytes
# {0,1,2, 9,10,11} and digest2 bytes {4,5,6, 13,14,15}.
_RESIZE_ORACLE = f"""
    WITH bs AS (
      SELECT lang,
             {_hexsum_idx_dd("md5(text || '0')", [0, 1, 2, 9, 10, 11])}
             + {_hexsum_idx_dd("md5(text || '2')", [4, 5, 6, 13, 14, 15])} AS byte_sum
      FROM documents
    )
    SELECT lang,
           count(*) AS n_images,
           CAST(2 AS INT) AS out_w,
           CAST(2 AS INT) AS out_h,
           CAST(sum(byte_sum) AS BIGINT) AS pixel_value_sum,
           sum(byte_sum) / (12.0 * count(*)) AS avg_resized_byte,
           12 * count(*) AS total_resized_bytes
    FROM bs GROUP BY lang
"""


@query("q_multimodal_resize", _RESIZE_ORACLE)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real resize path over the binary column: decode PPM -> numpy
    nearest-neighbor thumbnail (jsmr_spark/multimodal.py:resize_image)
    inside Arrow batches; aggregates per language — VALUE-CHECKED: for
    the 4x4 -> 2x2 case the nearest-neighbor grid is exactly the corner
    pixels, so the oracle recomputes the kept bytes' values straight
    from the md5 chain at their fixed digest offsets. A wrong index
    grid, a channel-order bug, or a truncated gather changes the byte
    sum and fails the hash."""
    from jsmr_spark.multimodal import resize_pipeline

    docs = t(spark, sf_dir, "documents")
    resized = resize_pipeline(docs)
    return (
        resized.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.any_value("out_w").alias("out_w"),
            F.any_value("out_h").alias("out_h"),
            F.sum("resized_byte_sum").alias("pixel_value_sum"),
            (F.sum("resized_byte_sum") / F.sum(F.length("resized"))).alias(
                "avg_resized_byte"
            ),
            F.sum(F.length("resized")).alias("total_resized_bytes"),
        )
    )


_FSAMP_MD5 = "md5(text || CAST(f AS VARCHAR) || ':' || CAST(i AS VARCHAR))"

_FSAMP_ORACLE = f"""
    WITH v AS (
      SELECT source, text, CAST(doc_id % 3 + 2 AS INT) AS n FROM documents
    ),
    s AS (
      SELECT source, n,
             list_aggregate(flatten(list_transform(
               list_filter(range(0, n), f -> f % 2 = 0),
               f -> list_transform(range(0, 3), i -> {_hexsum_dd(_FSAMP_MD5)})
             )), 'sum') AS bs,
             48 * ((n + 1) // 2) AS npix
      FROM v
    )
    SELECT source,
           count(*) AS n_videos,
           CAST(sum(n) AS BIGINT) AS total_frames,
           CAST(sum((n + 1) // 2) AS BIGINT) AS total_sampled,
           CAST(sum(bs) AS BIGINT) AS pixel_value_sum,
           sum(bs) / CAST(sum(npix) AS DOUBLE) AS avg_sampled_byte
    FROM s GROUP BY source
"""


@query("q_multimodal_framesample", _FSAMP_ORACLE)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: multi-frame P6 'videos' split by
    parsing the repeated headers executor-side, every 2nd frame kept
    and decoded (jsmr_spark/multimodal.py:framesample_batches);
    aggregates per source — VALUE-CHECKED: the oracle independently
    derives the frame count from doc_id, the kept-frame indices from
    the stride rule, and every sampled pixel byte from the md5 chain,
    so a mis-parsed frame boundary or an off-by-one in the stride fails
    the hash. Bytes stay in Arrow buffers; sampling parallelism =
    partition count."""
    from jsmr_spark.multimodal import framesample_pipeline

    docs = t(spark, sf_dir, "documents")
    sampled = framesample_pipeline(docs)
    return (
        sampled.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_videos"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.sum("n_sampled").cast("long").alias("total_sampled"),
            F.sum("sampled_byte_sum").alias("pixel_value_sum"),
            (F.sum("sampled_byte_sum") / F.sum("sampled_pixel_bytes")).alias(
                "avg_sampled_byte"
            ),
        )
    )


# lowercase hex of the P6 header b"P6\n4 4\n255\n" — the hash below runs
# in the HEX domain so both engines hash the identical byte string
# without needing a cross-engine binary-concat + binary-md5 path.
_PPM_HEADER_HEX = "50360a3420340a3235350a"

_MM_DEDUP_ORACLE = f"""
    WITH h AS (
      SELECT doc_id,
             md5('{_PPM_HEADER_HEX}' || md5(text || '0') || md5(text || '1')
                 || md5(text || '2')) AS blob_hash
      FROM documents
    )
    SELECT blob_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_doc,
           max(doc_id) AS last_doc
    FROM h GROUP BY blob_hash HAVING count(*) > 1
"""


@query("q_multimodal_dedup", _MM_DEDUP_ORACLE)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the BINARY media column: hash every synthesized
    blob's actual bytes (JVM md5 over the lowercase hex of the full
    blob — header + all 48 pixel bytes), group by content hash, report
    duplicate groups with a canonical survivor. The oracle reconstructs
    the identical hex string from the md5 chain, so the hash chain
    verifies every byte of every blob, not just the grouping.

    This is the image-corpus twin of q_dedup_exact (text): at 100 TB of
    media, content hashing is a narrow map at scan time and the dedup
    shuffles 32-hex-char digests only — bytes never move; the survivor
    list then drives a partition-pruned delete/rewrite exactly like
    q_dedup_keep_canonical."""
    from jsmr_spark.multimodal import synthesize_blob_col

    blobs = synthesize_blob_col(t(spark, sf_dir, "documents"))
    hashed = blobs.select(
        "doc_id", F.md5(F.lower(F.hex(F.col("blob")))).alias("blob_hash")
    )
    return (
        hashed.groupBy("blob_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )


def _bytes_dd(hexpr: str) -> str:
    """DuckDB expression: the 16 byte values of an md5 hex digest as a
    list (hex pair -> int, same strpos math as _hexsum_dd)."""
    return (
        "list_transform(range(1, 17), j -> "
        f"(strpos('0123456789abcdef', ({hexpr})[CAST(j*2-1 AS INT)]) - 1) * 16 + "
        f"(strpos('0123456789abcdef', ({hexpr})[CAST(j*2 AS INT)]) - 1))"
    )


_PHASH_ORACLE = f"""
    WITH bl AS (
      SELECT doc_id,
             {_bytes_dd("md5(text || '0')")}
               || {_bytes_dd("md5(text || '1')")}
               || {_bytes_dd("md5(text || '2')")} AS b
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               b[CAST(3*i+1 AS INT)] + b[CAST(3*i+2 AS INT)] + b[CAST(3*i+3 AS INT)]) AS gray
      FROM bl
    ),
    ph AS (
      SELECT doc_id,
             CAST(list_aggregate(list_transform(range(0, 16), i ->
               CASE WHEN 16 * gray[CAST(i+1 AS INT)] > list_aggregate(gray, 'sum')
                    THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END), 'sum')
               AS BIGINT) AS phash
      FROM g
    )
    SELECT doc_id, phash, count(*) OVER (PARTITION BY phash) AS n_same
    FROM ph
"""


@query("q_multimodal_phash", _PHASH_ORACLE)
def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (average) hash over the decoded image bytes: bit i is
    set iff pixel i's integer gray sum beats the image mean (n*gray >
    total — exact, no float mean), giving a 16-bit hash; output is
    every doc's hash plus its equal-hash group size — the image-corpus
    near-dup grouping that byte-exact dedup (q_multimodal_dedup)
    cannot see, since perceptually-identical re-encodes differ in
    bytes but share the hash.

    VALUE-CHECKED end to end: the oracle recomputes all 48 pixel bytes
    from the md5 chain with hex math and derives the identical hash,
    so a mis-parsed header, channel-order swap, or thresholding drift
    in the Arrow pipeline fails on every row.

    Shape at 100 TB: decode + hash is a narrow Arrow map (bytes never
    leave the executor); grouping shuffles 8-byte hashes only. Hamming
    <= t widening uses the q_dedup_simhash pigeonhole byte-block join
    on the same column."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    from jsmr_spark.multimodal import phash_pipeline

    hashes = phash_pipeline(docs)
    w = Window.partitionBy("phash")
    return hashes.select(
        "doc_id", "phash", F.count(F.lit(1)).over(w).alias("n_same")
    )


# --- audio frame-energy features -------------------------------------


def _hexenergy_dd(hexpr: str) -> str:
    """DuckDB expression: sum of (byte-128)^2 over the 16 byte values
    of an md5 hex digest — one analysis frame's exact PCM energy."""
    v = (
        f"((strpos('0123456789abcdef', ({hexpr})[CAST(j*2-1 AS INT)]) - 1) * 16 + "
        f"(strpos('0123456789abcdef', ({hexpr})[CAST(j*2 AS INT)]) - 1))"
    )
    return (
        "list_aggregate(list_transform(range(1, 17), j -> "
        f"({v} - 128) * ({v} - 128)), 'sum')"
    )


_AUDIO_ORACLE = f"""
    WITH e AS (
      SELECT lang,
             {_hexenergy_dd("md5(text || 'a0')")} AS e0,
             {_hexenergy_dd("md5(text || 'a1')")} AS e1,
             {_hexenergy_dd("md5(text || 'a2')")} AS e2
      FROM documents
    ),
    c AS (SELECT lang, e0 + e1 + e2 AS energy, greatest(e0, e1, e2) AS maxf FROM e)
    SELECT lang,
           count(*) AS n_clips,
           CAST(48 * count(*) AS BIGINT) AS total_samples,
           CAST(sum(energy) AS BIGINT) AS energy_sum,
           CAST(max(maxf) AS BIGINT) AS max_frame_energy,
           CAST(8000 AS INT) AS sample_rate,
           CAST(sum(energy) AS DOUBLE) / CAST(48 * count(*) AS DOUBLE)
             AS avg_sample_energy
    FROM c GROUP BY lang
"""


@query("q_multimodal_audio", _AUDIO_ORACLE)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality feature extraction: a REAL RIFF/WAVE container
    parse (pure-Python chunk walk — magic, fmt, data; no audio libs,
    same strategy as the PPM/BMP image decode) over synthesized 8-bit
    mono PCM clips, then per-frame energy sum((s-128)^2) in exact
    integers, aggregated per language. The oracle recomputes every
    sample byte from the md5 chain and every frame energy from first
    principles, so a mis-parsed chunk offset, a dropped sample, or a
    wrong frame split anywhere in the Arrow pipeline fails the hash
    (sample_rate itself is value-checked against the header constant).

    Scale shape: identical to the image keys — bytes stay in
    executor-side Arrow buffers, mapInPandas parallelism = partition
    count, features are narrow typed columns; swap parse_wav for
    soundfile/librosa for real codecs, the plumbing is unchanged."""
    from jsmr_spark.multimodal import audio_pipeline

    docs = t(spark, sf_dir, "documents")
    feats = audio_pipeline(docs)
    return (
        feats.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_samples").cast("long").alias("total_samples"),
            F.sum("energy_sum").alias("energy_sum"),
            F.max("max_frame_energy").alias("max_frame_energy"),
            F.min("sample_rate").alias("sample_rate"),
            (
                F.sum("energy_sum").cast("double")
                / F.sum("n_samples").cast("double")
            ).alias("avg_sample_energy"),
        )
    )


def _frame_energy_dd(f_var: str = "f") -> str:
    """DuckDB: integer brightness sum of frame `f` — the 48 pixel bytes
    are 3 md5 digests over (text, frame, block), same chain the Spark
    synthesizer writes (jsmr_spark/multimodal.py synthesize_video_col)."""
    return " + ".join(
        _hexsum_dd(f"md5(text || CAST({f_var} AS VARCHAR) || ':{i}')")
        for i in range(3)
    )


@query(
    "q_multimodal_scenecut",
    f"""
    WITH v AS (
      SELECT source, text, CAST(doc_id % 3 + 2 AS INT) AS n FROM documents
    ),
    es AS (
      SELECT source, n,
             list_transform(range(0, n), f -> {_frame_energy_dd()}) AS e
      FROM v
    ),
    d AS (
      SELECT source, n,
             len(list_filter(range(1, n),
                 f -> abs(e[f+1] - e[f]) > {SCENE_CUT_THRESHOLD})) AS n_cuts,
             list_aggregate(list_transform(range(1, n),
                 f -> abs(e[f+1] - e[f])), 'max') AS max_jump
      FROM es
    )
    SELECT source,
           count(*) AS n_videos,
           CAST(sum(n_cuts) AS BIGINT) AS total_cuts,
           CAST(sum(CASE WHEN n_cuts > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_videos_with_cut,
           CAST(max(max_jump) AS BIGINT) AS max_jump,
           CAST(sum(n_cuts) AS BIGINT) / CAST(sum(n - 1) AS DOUBLE) AS cut_rate
    FROM d GROUP BY source
    """,
)
def q_multimodal_scenecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection (intensity-delta shot boundary): every
    frame of each synthesized multi-frame P6 'video' is decoded
    executor-side (jsmr_spark/multimodal.py:scenecut_batches, same
    header boundary scan as q_multimodal_framesample), a cut is flagged
    where the absolute jump in integer frame-brightness sum exceeds
    the threshold, and the report aggregates per source — VALUE-CHECKED:
    the oracle independently rebuilds every frame's energy from the md5
    chain and replays the adjacent-difference rule, so a mis-parsed
    boundary, a skipped frame, or an off-by-one in the delta indexing
    fails the hash. Bytes stay in Arrow buffers; detection parallelism
    = partition count; the shuffle carries one 4-int row per video."""
    from jsmr_spark.multimodal import scenecut_pipeline

    docs = t(spark, sf_dir, "documents")
    cuts = scenecut_pipeline(docs)
    return (
        cuts.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_videos"),
            F.sum("n_cuts").cast("long").alias("total_cuts"),
            F.sum(F.when(F.col("n_cuts") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_videos_with_cut"),
            F.max("max_jump").cast("long").alias("max_jump"),
            (
                F.sum("n_cuts").cast("long")
                / F.sum(F.col("n_frames") - 1).cast("double")
            ).alias("cut_rate"),
        )
    )


_SIL_E = [_hexenergy_dd(f"md5(text || 'a{i}')") for i in range(3)]
_SIL_TH = 80_000  # mirrors jsmr_spark.multimodal.SILENCE_THRESHOLD
_SIL_B = [f"({e} < {_SIL_TH})" for e in _SIL_E]

_SILENCE_ORACLE = f"""
    WITH e AS (
      SELECT lang,
             {_SIL_B[0]} AS b1, {_SIL_B[1]} AS b2, {_SIL_B[2]} AS b3
      FROM documents
    ),
    c AS (
      SELECT lang,
             (CASE WHEN b1 THEN 1 ELSE 0 END + CASE WHEN b2 THEN 1 ELSE 0 END
              + CASE WHEN b3 THEN 1 ELSE 0 END) AS n_silent,
             CASE WHEN b1 AND b2 AND b3 THEN 3
                  WHEN (b1 AND b2) OR (b2 AND b3) THEN 2
                  WHEN b1 OR b2 OR b3 THEN 1 ELSE 0 END AS lr
      FROM e
    )
    SELECT lang,
           count(*) AS n_clips,
           CAST(sum(n_silent) AS BIGINT) AS total_silent_frames,
           CAST(sum(CASE WHEN lr = 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fully_silent,
           CAST(max(lr) AS INT) AS max_run,
           round(CAST(sum(n_silent) AS BIGINT)
                 / CAST(3 * count(*) AS DOUBLE), 4) AS silent_rate
    FROM c GROUP BY lang
"""


@query("q_multimodal_silence", _SILENCE_ORACLE)
def q_multimodal_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio silence detection / VAD census: frames below the exact
    integer energy threshold are silence; per language the report
    carries silent-frame counts, fully-silent clip counts, and the
    longest silent run — what an audio-curation pipeline uses to trim
    leading/trailing silence and drop dead clips before training. The
    oracle recomputes every frame energy from the md5 sample chain AND
    re-derives the longest run through explicit 3-frame case logic, so
    a mis-framed PCM split or an off-by-one in the run-length scan
    fails the hash.

    Same Arrow scale shape as q_multimodal_audio: blobs stay in
    executor batches; the run-length scan is the generic any-length
    loop even though the fixture clips are 3 frames."""
    from jsmr_spark.multimodal import audio_silence_pipeline

    docs = t(spark, sf_dir, "documents")
    feats = audio_silence_pipeline(docs)
    return (
        feats.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_silent").cast("long").alias("total_silent_frames"),
            F.sum((F.col("longest_run") == F.col("n_frames")).cast("int"))
            .cast("long")
            .alias("n_fully_silent"),
            F.max("longest_run").alias("max_run"),
            r4(
                F.sum("n_silent").cast("double")
                / (3 * F.count(F.lit(1))).cast("double")
            ).alias("silent_rate"),
        )
    )
