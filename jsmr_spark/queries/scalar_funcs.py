"""Scalar function surface: string / date / math / conditional / cast /
array / map / json (SURVEY.md §2.B).

Reference parity: in JsMr every scalar transform is arbitrary user JS
inside map() (SURVEY.md §2.A A3/A11). Here each family maps to
built-in pyspark.sql.functions so the hot path stays inside
whole-stage codegen — no Python boundary per row.

Dialect traps handled (SURVEY.md §7.1):
  * DuckDB regexp_replace is first-match unless the 'g' flag is given.
  * DuckDB floor()/year()/len() return DOUBLE/BIGINT where Spark has
    LONG/INT — both sides cast to long explicitly.
  * Spark add_months returns DATE — cast back to timestamp to match
    the interval arithmetic on the DuckDB side.
  * double->int casts truncate in Spark but round in DuckDB — portable
    form is an explicit floor() on both sides.
  * dayofweek numbering: Spark 1=Sunday, DuckDB 0=Sunday — oracle adds 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsmr_spark.compat import r4
from jsmr_spark.queries.common import t
from jsmr_spark.registry import query


@query(
    "q_str_funcs",
    """
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           substring(c_name, 10, 5) AS name_mid,
           length(c_name) AS name_len,
           concat(c_name, '-', c_mktsegment) AS name_seg,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           trim(concat('  ', c_mktsegment, '  ')) AS seg_trimmed
    FROM customer
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions."""
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_name"), F.lit("-"), F.col("c_mktsegment")).alias("name_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("seg_trimmed"),
    )


@query(
    "q_str_regexp",
    r"""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS first_word,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(p_type, '^(ECO|PRO)') AS is_eco_pro
    FROM part
    """,
)
def q_str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract / replace / match (patterns kept in the Java∩RE2
    common subset; DuckDB needs the 'g' flag to replace all)."""
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("long").alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "*").alias("devoweled"),
        F.col("p_type").rlike(r"^(ECO|PRO)").alias("is_eco_pro"),
    )


@query(
    "q_str_split",
    """
    SELECT p_partkey, word, length(word) AS word_len
    FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part)
    """,
)
def q_str_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + explode (the 'flatten' shape of the MR map phase)."""
    return (
        t(spark, sf_dir, "part")
        .select("p_partkey", F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .withColumn("word_len", F.length("word"))
    )


@query(
    "q_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mth,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(last_day(o_orderdate) AS DATE) AS month_end
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions; dow normalized to Spark's 1=Sunday numbering."""
    d = F.col("o_orderdate")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mth"),
        F.quarter(d).cast("long").alias("qtr"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).cast("long").alias("days_since_95"),
        F.add_months(d, 3).cast("timestamp").alias("plus_3m"),
        F.last_day(d).alias("month_end"),
    )


@query(
    "q_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000) AS abs_dev,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           round(sqrt(l_quantity), 4) AS qty_sqrt,
           pow(l_quantity, 2) AS qty_sq,
           round(ln(l_extendedprice), 4) AS price_ln,
           round(log10(l_extendedprice), 4) AS price_log10,
           round(exp(l_discount), 4) AS disc_exp,
           l_orderkey % 7 AS key_mod7,
           CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions; transcendentals round(,4) to absorb sub-ulp libm
    differences between JVM and C implementations."""
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        r4(F.sqrt("l_quantity")).alias("qty_sqrt"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        r4(F.log("l_extendedprice")).alias("price_ln"),
        r4(F.log10("l_extendedprice")).alias("price_log10"),
        r4(F.exp("l_discount")).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
    )


@query(
    "q_cond_funcs",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           greatest(o_totalprice, 100000.0::DOUBLE) AS price_floor100k,
           least(o_totalprice, 100000.0::DOUBLE) AS price_cap100k,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'rush' ELSE 'normal' END AS urgency,
           if(o_totalprice > 200000, 'big', 'small') AS size_tag
    FROM orders
    """,
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar functions: coalesce/nullif/greatest/least/if."""
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor100k"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("price_cap100k"),
        F.when(F.col("o_orderpriority") == "1-URGENT", "rush").otherwise("normal").alias("urgency"),
        F.expr("if(o_totalprice > 200000, 'big', 'small')").alias("size_tag"),
    )


@query(
    "q_cast",
    """
    SELECT l_orderkey,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_int,
           CAST(CAST(l_orderkey AS VARCHAR) AS DOUBLE) AS key_roundtrip,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    """,
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-type casts. double->int goes through floor() on both sides:
    bare casts diverge (Spark truncates, DuckDB rounds). l_quantity is
    integer-valued so its direct cast is tie-free and portable."""
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.floor("l_extendedprice").alias("price_int"),
        F.col("l_orderkey").cast("string").cast("double").alias("key_roundtrip"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_quantity").cast("long").alias("qty_int"),
    )


@query(
    "q_array_funcs",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) AS first_elem,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS vec_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum'), 4) AS head_sum
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size/index/slice plus higher-order transform/filter/aggregate
    over the embedding column — all JVM-side, no UDF."""
    emb = F.col("embedding")
    dsum = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, lambda x: x.cast("double")), F.lit(0.0), lambda a, x: a + x
    )
    # Raw folds staged before r4 (r12): r4 references its argument
    # twice and HOF folds are interpreted, so the two sums ran twice
    # per row inlined. Same doubles.
    return (
        t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.size(emb).cast("long").alias("dim"),
            F.element_at(emb, 1).cast("double").alias("first_raw"),
            dsum(emb).alias("sum_raw"),
            F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
            dsum(F.slice(emb, 1, 8)).alias("head_raw"),
        )
        .select(
            "vec_id",
            "dim",
            r4(F.col("first_raw")).alias("first_elem"),
            r4(F.col("sum_raw")).alias("vec_sum"),
            "n_pos",
            r4(F.col("head_raw")).alias("head_sum"),
        )
    )


@query(
    "q_map_funcs",
    """
    SELECT event_id,
           'k,k2' AS keys_sorted,
           2 AS n_entries,
           CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k2_val,
           CAST(json_extract_string(props, '$.k') AS INT) * 3 AS val_sum
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map from parsed JSON, read it back out
    through map_keys / map_values / element_at / size.

    A raw MAP column can never be hash-compared across engines (entry
    order and hashing are engine-specific), so the map is EMITTED as
    portable projections — sorted key list, entry count, one extracted
    value, aggregated values — and the oracle recomputes each expected
    value straight from the JSON. The MapType machinery is still what
    produces every output; only the final representation is portable.
    NULL k flows through: element_at and the value sum go NULL,
    matching the oracle's NULL arithmetic.

    Perf (VERDICT r3 #4, profiled at sf0.1): the JSON parse is the
    floor. History: the `F.aggregate(map_values, lambda)` fold cost
    ~0.5s extra (lambda HOFs fall out of whole-stage codegen) — summing
    the two map_values entries via element_at cut exec 1.27s -> 0.78s
    (lambda HOFs stay covered by q_array_funcs); from_json measured
    equal to get_json_object (1.17 vs 1.24s) so that rewrite was not
    taken; the round-4 VARIANT path (parse_json + try_variant_get)
    measured 0.79s vs get_json_object's 1.35s best-of-3 and IS taken —
    the binary variant extraction skips the per-row text re-parse
    while the MapType machinery downstream is unchanged."""
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int")
    m = F.create_map(F.lit("k"), k, F.lit("k2"), k * 2)
    vals = F.map_values(m)
    return t(spark, sf_dir, "events").select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(m).alias("n_entries"),
        F.element_at(m, F.lit("k2")).alias("k2_val"),
        (F.element_at(vals, 1) + F.element_at(vals, 2)).alias("val_sum"),
    )


@query(
    "q_json_funcs",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent,
           CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k_doubled
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction: ONE parse per row feeding every output column
    (missing paths yield NULL on both engines). History of the timed
    alternatives (sf0.1 steady exec, best-of-5, guide §1.4 noop-
    confirmed compute-bound): per-column get_json_object 0.48 s (one
    full text parse per column), from_json struct 0.39 s (one parse),
    parse_json VARIANT + try_variant_get 0.35 s — the r12 form. The
    binary variant is parsed once and each path extraction walks the
    encoded value; at 100 TB the variant column is also the
    shreddable/pushable representation (see q_json_variant)."""
    d = t(spark, sf_dir, "events").select(
        "event_id", F.parse_json(F.col("props")).alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "string")
    return d.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_typed"),
        F.try_variant_get(F.col("v"), "$.missing", "string").alias("absent"),
        (k.cast("int") * 2).alias("k_doubled"),
    )


@query(
    "q_json_variant",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through the Spark 4 VARIANT type:
    parse_json builds a binary variant per row (ONE parse, reusable for
    any number of path extractions — unlike get_json_object, which
    re-parses per call; that cost is measured in q_map_funcs' history),
    then variant_get extracts a typed field for aggregation.

    VARIANT is the lakehouse answer to schema-less JSON columns: the
    binary encoding is columnar-shreddable and predicate-pushable in
    Spark 4 table formats, so at 100 TB the variant column scans like
    any other and never re-parses text. The oracle reaches the same
    values through DuckDB's JSON path functions — the surface differs,
    the semantics must not."""
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    return (
        t(spark, sf_dir, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "q_flatten_nested",
    """
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN CAST([] AS VARCHAR[])
                  ELSE string_split(text, ' ')[1:3] END AS arr
      FROM documents
    )
    SELECT d.doc_id, u.pos, u.tok
    FROM d LEFT JOIN LATERAL (
      SELECT CAST(i - 1 AS INT) AS pos, arr[CAST(i AS INT)] AS tok
      FROM unnest(generate_series(1, len(arr))) t(i)
    ) u ON true
    """,
)
def q_flatten_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER flatten (posexplode_outer): unnesting that PRESERVES rows
    whose array is empty — the semantics plain explode silently drops,
    and the bug class (documents vanishing because their annotation
    list was empty) every nested-ingest pipeline hits once. Every 7th
    doc carries an empty array and must survive as a (doc_id, NULL,
    NULL) row; the oracle restates outer-unnest as a LEFT LATERAL so
    the preserved-row rule is hash-pinned, not just the happy path.

    pos is 0-based (Spark's posexplode convention; the oracle aligns
    with i-1). Scale shape: narrow generator, no shuffle — flatten
    fan-out is bounded by the array length like every explode."""
    toks = F.split(F.col("text"), " ")
    arr = F.when(
        F.col("doc_id") % 7 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(toks, 1, 3))
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", arr.alias("arr"))
        .select("doc_id", F.posexplode_outer("arr").alias("pos", "tok"))
    )
