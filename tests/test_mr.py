"""MR-compat API: Tier-A parity checks (SURVEY.md §2.A)."""

from pyspark.sql import functions as F

from jsmr_spark.io import load_table
from jsmr_spark.mr import job, wordcount
from tests.conftest import SF_DIR


def test_mr_wordcount_equals_dataframe_wordcount(spark):
    docs = load_table(spark, SF_DIR, "documents")
    mr = {(r.token, r.cnt) for r in wordcount(docs).collect()}
    df = {
        (r.token, r.cnt)
        for r in docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert mr == df and len(mr) > 0


def test_mr_job_without_combiner(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = job(
        docs,
        map_fn=lambda row: [(row.lang, row.n_chars)],
        reduce_fn=lambda key, values: [(key, len(values), sum(values))],
        output_schema="lang string, n_docs long, total_chars long",
    )
    expect = {
        (r.lang, r.n_docs, r.total_chars)
        for r in docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .collect()
    }
    assert {(r.lang, r.n_docs, r.total_chars) for r in out.collect()} == expect


def test_mr_inverted_index_equals_dataframe(spark):
    """The list-concat combine + digest reduce must agree with the
    DataFrame re-expression (collect_set + sort + md5)."""
    docs = load_table(spark, SF_DIR, "documents")
    from jsmr_spark.mr import inverted_index

    mr = {
        (r.token, r.df, r.min_doc, r.max_doc, r.postings_md5)
        for r in inverted_index(docs).collect()
    }
    df = {
        (r.token, r.df, r.min_doc, r.max_doc, r.postings_md5)
        for r in docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_set("doc_id")), lambda d: d.cast("string")
                    ),
                    ",",
                ).cast("binary")
            ).alias("postings_md5"),
        )
        .collect()
    }
    assert mr == df and len(mr) > 0


def test_mr_job_chaining(spark):
    """A8: output of job N is input of job N+1."""
    docs = load_table(spark, SF_DIR, "documents")
    counts = wordcount(docs)
    by_len = job(
        counts,
        map_fn=lambda row: [(len(row.token), row.cnt)],
        reduce_fn=lambda key, values: [(key, sum(values))],
        combine_fn=lambda a, b: a + b,
        output_schema="token_len long, total long",
    )
    rows = {(r.token_len, r.total) for r in by_len.collect()}
    assert rows and all(l > 0 for l, _ in rows)


def test_mr_join_matches_dataframe_join(spark):
    """Reduce-side compat join equals the relational join on inputs
    with fan-out (duplicate keys both sides), misses, and empty
    groups on either side."""
    from jsmr_spark.mr import mr_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (5, "e")], "k int, lv string"
    )
    right = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 21), (4, 40)], "k int, rv int"
    )
    got = {
        (r.k, r.lv, r.rv)
        for r in mr_join(
            left,
            right,
            key_fn_l=lambda r: r.k,
            key_fn_r=lambda r: r.k,
            join_fn=lambda k, a, b: [(k, a.lv, b.rv)],
            output_schema="k int, lv string, rv int",
        ).collect()
    }
    exp = {(r.k, r.lv, r.rv) for r in left.join(right, "k").collect()}
    assert got == exp
    # fan-out sanity: key 1 -> 2x1, key 2 -> 1x2, keys 3/4/5 -> no match
    assert len(got) == 4
