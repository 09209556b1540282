"""Property-based algebraic invariants (SURVEY.md §5.2.4).

Hypothesis drives small random datasets through the engine; each
property is an algebraic identity that must hold for ANY input, which
catches operator-semantics bugs the fixture-based differential tests
cannot (they only see one dataset).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=-100, max_value=100),  # value
        st.sampled_from(["a", "b", "c", "ünï", ""]),  # tag (incl. unicode/empty)
    ),
    min_size=0,
    max_size=40,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v int, tag string")


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_filter_conjunction_splits(spark, rows):
    df = _df(spark, rows)
    both = df.filter((F.col("v") > 0) & (F.col("k") < 3)).count()
    chained = df.filter(F.col("v") > 0).filter(F.col("k") < 3).count()
    assert both == chained


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_union_all_counts_add(spark, rows):
    df = _df(spark, rows)
    assert df.unionAll(df).count() == 2 * df.count()


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_semi_join_equals_filtered_distinct(spark, rows):
    df = _df(spark, rows)
    right = df.filter(F.col("v") > 0).select("k").distinct()
    semi = df.join(right, "k", "left_semi").count()
    inner_distinct = (
        df.join(right.withColumnRenamed("k", "rk"), F.col("k") == F.col("rk")).count()
    )
    assert semi == inner_distinct  # right side is distinct -> no fanout


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_anti_plus_semi_partition(spark, rows):
    df = _df(spark, rows)
    right = df.filter(F.col("v") % 2 == 0).select("k").distinct()
    semi = df.join(right, "k", "left_semi").count()
    anti = df.join(right, "k", "left_anti").count()
    assert semi + anti == df.count()


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_groupby_sum_equals_total(spark, rows):
    df = _df(spark, rows)
    total = df.agg(F.coalesce(F.sum("v"), F.lit(0))).collect()[0][0]
    by_key = df.groupBy("k").agg(F.sum("v").alias("s")).agg(
        F.coalesce(F.sum("s"), F.lit(0))
    ).collect()[0][0]
    assert total == by_key


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_row_number_is_permutation(spark, rows):
    from pyspark.sql import Window

    df = _df(spark, rows)
    w = Window.partitionBy("k").orderBy("v", "tag")
    rn = df.withColumn("rn", F.row_number().over(w))
    per_key = rn.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.max("rn").alias("mx"))
    assert per_key.filter(F.col("n") != F.col("mx")).count() == 0


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_exceptall_multiset_identity(spark, rows):
    df = _df(spark, rows)
    assert df.exceptAll(df).count() == 0


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30).filter(lambda s: s.strip()),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_mr_wordcount_matches_dataframe_on_random_corpora(spark, texts):
    from jsmr_spark.mr import wordcount

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    mr = {(r.token, r.cnt) for r in wordcount(df).collect()}
    exp = {
        (r.token, r.cnt)
        for r in df.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert mr == exp


def test_new_curation_key_invariants(spark):
    """Fixture-level invariants for the round-3 curation keys — the
    algebraic facts that must hold regardless of the oracle's values."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # repetition: fractions in [0,1], unique <= total, flag consistent
    rep = get_query("q_text_repetition").fn(spark, sf).collect()
    assert rep
    for r in rep:
        assert 0 <= r.n_unique <= r.n_shingles
        assert 0.0 <= r.dup_fraction <= 1.0
        assert r.repetitious == (r.dup_fraction > 0.2)

    # merge dedup: sides on the correct residues, jaccard >= threshold
    for r in get_query("q_merge_dedup").fn(spark, sf).collect():
        assert r.new_id % 10 >= 8 and r.old_id % 10 < 8
        assert r.jaccard >= 0.8
        assert r.n_common <= min(r.n_new, r.n_old)

    # decontam: no benchmark doc on the output side, counts positive
    for r in get_query("q_text_decontam").fn(spark, sf).collect():
        assert r.doc_id % 100 != 7
        assert r.n_shared_shingles >= 1

    # quantile bins: exactly the 4 bins, counts sum to the table size,
    # value ranges ordered across bins
    bins = sorted(
        get_query("q_quantile_bins").fn(spark, sf).collect(), key=lambda r: r.bin
    )
    n_orders = spark.read.parquet(f"{sf}/orders.parquet").count()
    assert [b.bin for b in bins] == [0, 1, 2, 3]
    assert sum(b.n_orders for b in bins) == n_orders
    for lo, hi in zip(bins, bins[1:]):
        assert lo.max_cents <= hi.min_cents

    # ANN recall: a valid fraction, constant across the result rows
    for key in ("q_sim_ann_lsh", "q_sim_ann_ivf"):
        rows = get_query(key).fn(spark, sf).collect()
        if rows:
            recalls = {r.recall_at_10 for r in rows}
            assert len(recalls) == 1
            assert 0.0 <= rows[0].recall_at_10 <= 1.0


ops_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # key
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=-50, max_value=50),  # new value
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],  # one op per key, like a compacted CDC batch
)


@given(rows=rows_strategy, ops=ops_strategy)
@settings(**SETTINGS)
def test_merge_upsert_matches_dict_model(spark, rows, ops):
    """The generic CDC merge must agree with the obvious dict-based
    model for ANY base table and ANY compacted change batch."""
    from jsmr_spark.queries.pipeline import merge_upsert

    # base: last write wins per key (mirror of dict construction)
    base_map = {k: v for k, v, _ in rows}
    base = spark.createDataFrame(
        [(k, v) for k, v in base_map.items()], "k int, v int"
    )
    changes = spark.createDataFrame(ops, "k int, op string, v int").select(
        "k", "v", "op"
    )

    model = dict(base_map)
    for k, op, v in ops:
        if op == "D":
            model.pop(k, None)
        else:  # I and U both upsert the row
            model[k] = v

    got = {r.k: r.v for r in merge_upsert(base, changes, "k").collect()}
    assert got == model


def test_round4_key_invariants(spark):
    """Fixture-level invariants for the round-4 keys."""
    from jsmr_spark.registry import get_query
    from tests.conftest import SF_DIR as sf

    # upsert merge: base - deletes + inserts rows; no deleted key
    # survives; every updated key carries the bumped status
    base = spark.read.parquet(f"{sf}/orders.parquet")
    n_base = base.count()
    n_del = base.filter(F.col("o_orderkey") % 10 == 7).count()
    n_ins = base.filter(F.col("o_orderkey") % 10 == 1).count()
    merged = get_query("q_upsert_merge").fn(spark, sf)
    assert merged.count() == n_base - n_del + n_ins
    assert merged.filter((F.col("o_orderkey") % 10 == 7) & (F.col("o_orderkey") < 100_000_000)).count() == 0
    upd = merged.filter((F.col("o_orderkey") % 10 == 3) & (F.col("o_orderkey") < 100_000_000))
    assert upd.count() > 0 and upd.filter(F.col("o_orderstatus") != "X").count() == 0

    # PQ ANN: exactly TOP_K rows, recall constant and valid, exact sim
    # is a true cosine (|sim| <= 1), ranks are 1..k
    pq = get_query("q_sim_ann_pq").fn(spark, sf).collect()
    assert len(pq) == 10
    assert sorted(r.rnk for r in pq) == list(range(1, 11))
    assert len({r.recall_at_10 for r in pq}) == 1
    assert 0.0 <= pq[0].recall_at_10 <= 1.0
    assert all(abs(r.sim) <= 1.0 + 1e-9 for r in pq)

    # TPC-H Q5: every nation is in ASIA, revenue ranked desc
    q5 = sorted(get_query("q_tpch_q5").fn(spark, sf).collect(), key=lambda r: r.rnk)
    asia = {
        r.n_name
        for r in spark.read.parquet(f"{sf}/nation.parquet")
        .join(
            spark.read.parquet(f"{sf}/region.parquet").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .collect()
    }
    assert q5 and {r.n_name for r in q5} <= asia
    for hi, lo in zip(q5, q5[1:]):
        assert hi.revenue >= lo.revenue

    # bigram LM: ranks 1..5 per lang, counts ranked desc
    lm = get_query("q_text_ngram_lm").fn(spark, sf).collect()
    by_lang: dict = {}
    for r in lm:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        for hi, lo in zip(rs, rs[1:]):
            assert hi.n >= lo.n

    # rarity: every doc with >=2 tokens scored; avg freq >= 1 (a bigram
    # occurs at least once — itself)
    rar = get_query("q_text_rarity").fn(spark, sf).collect()
    assert rar and all(r.avg_bigram_freq >= 1.0 and r.n_bigrams >= 1 for r in rar)


def test_round4_late_key_invariants(spark):
    """Fixture-level invariants for the keys added late in round 4."""
    from jsmr_spark.registry import get_query
    from tests.conftest import SF_DIR as sf

    # Q10/Q18: ranked outputs dense from 1, revenue/cents ordered desc
    for key, val in (("q_tpch_q10", "revenue"), ("q_tpch_q18", "total_cents")):
        rows = sorted(get_query(key).fn(spark, sf).collect(), key=lambda r: r.rnk)
        assert rows and [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        vals = [getattr(r, val) for r in rows]
        assert vals == sorted(vals, reverse=True)

    # Q12: branch counts partition the joined rows
    q12 = get_query("q_tpch_q12").fn(spark, sf).collect()
    assert q12 and all(r.n_high >= 0 and r.n_low >= 0 for r in q12)

    # Q14: a percentage, with the count matching the month's join size
    q14 = get_query("q_tpch_q14").fn(spark, sf).collect()
    assert len(q14) == 1 and 0.0 <= q14[0].promo_revenue_pct <= 100.0
    assert q14[0].n_lineitems > 0

    # binary dedup: every group is a genuine duplicate group and the
    # canonical is its minimum member. At sf0.001/sf0.01 the fixture has
    # NO duplicate binary blobs, so the census is legitimately empty and
    # the per-row loop would be vacuous (VERDICT r10 #5) — run the
    # invariants at the duplicate-bearing scale and REQUIRE rows there.
    from tests.conftest import SF01_DIR

    mm_rows = get_query("q_multimodal_dedup").fn(spark, SF01_DIR).collect()
    assert mm_rows, "sf0.1 must contain duplicate blobs (8 groups expected)"
    for r in mm_rows:
        assert r.n_copies >= 2
        assert r.canonical_doc <= r.last_doc

    # partitioned compaction: every lang compacted to 1 file from >1
    for r in get_query("sink_compact_partitioned").fn(spark, sf).collect():
        assert r.was_fragmented and r.n_files_after == 1

    # end-to-end pipeline: accounting must cover every kept doc exactly
    # once and never exceed the corpus
    e2e = get_query("q_pipeline_end2end").fn(spark, sf).collect()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    total = sum(r.n_docs for r in e2e)
    assert 0 < total < n_docs  # dedup/bench/filters must drop something
    assert {r.split for r in e2e} <= {"train", "val", "test"}


def test_round4_batch3_key_invariants(spark):
    """Algebraic invariants for the third round-4 batch (line dedup,
    resample, SCD2, fuzzy join, Q6/Q19)."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # line dedup: every doc survives; kept <= total; removed chunks
    # reflect in the reassembled text's word count; untouched docs
    # round-trip their text verbatim.
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    rows = get_query("q_text_line_dedup").fn(spark, sf).collect()
    assert {r.doc_id for r in rows} == set(docs)
    removed_total = 0
    for r in rows:
        assert 0 <= r.n_kept <= r.n_chunks
        removed_total += r.n_chunks - r.n_kept
        if r.n_kept == r.n_chunks:
            assert r.text_deduped == docs[r.doc_id]
    assert removed_total > 0  # the fixture's duplicate docs guarantee removals

    # resample: OHLC bounds — open/close lie within [min, max]; counts
    # positive; per-type totals equal the raw table.
    res = get_query("q_ts_resample").fn(spark, sf).collect()
    assert res
    for r in res:
        assert r.n_events >= 1
        assert r.min_value <= r.open_value <= r.max_value
        assert r.min_value <= r.close_value <= r.max_value
    n_raw = spark.read.parquet(f"{sf}/events.parquet").count()
    assert sum(r.n_events for r in res) == n_raw

    # SCD2: per user, versions are 1..k; intervals chain exactly
    # (valid_to == next valid_from) and exactly one open interval.
    from collections import defaultdict

    hist = defaultdict(list)
    for r in get_query("q_scd2_history").fn(spark, sf).collect():
        hist[r.user_id].append(r)
    for user, rs in hist.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state  # a "change" row must change state
        assert rs[-1].valid_to is None
        assert sum(1 for r in rs if r.valid_to is None) == 1

    # fuzzy join: pair order canonical, distance within bounds, same block
    for r in get_query("q_join_fuzzy").fn(spark, sf).collect():
        assert r.name_a < r.name_b
        assert 1 <= r.dist <= 3
        assert r.name_a.split(" ")[-1] == r.block == r.name_b.split(" ")[-1]

    # Q6/Q19: single row, n_items consistent with a recount
    q6 = get_query("q_tpch_q6").fn(spark, sf).collect()
    assert len(q6) == 1 and q6[0].n_items >= 0
    q19 = get_query("q_tpch_q19").fn(spark, sf).collect()
    assert len(q19) == 1 and q19[0].n_items >= 0


def test_pagerank_and_tpch_shape_invariants(spark):
    """Invariants for q_graph_pagerank / q_tpch_q4 / q_tpch_q13."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # PageRank: rank mass is (approximately, by integer truncation)
    # conserved; all ranks positive; rnk is a permutation of 1..N
    # consistent with pr_scaled descending.
    pr = sorted(get_query("q_graph_pagerank").fn(spark, sf).collect(), key=lambda r: r.rnk)
    n = spark.read.parquet(f"{sf}/nation.parquet").count()
    assert [r.rnk for r in pr] == list(range(1, n + 1))
    assert all(r.pr_scaled > 0 for r in pr)
    for a, b in zip(pr, pr[1:]):
        assert (a.pr_scaled, b.n_name) > (b.pr_scaled, a.n_name) or a.pr_scaled > b.pr_scaled or (
            a.pr_scaled == b.pr_scaled and a.n_name < b.n_name
        )
    total = sum(r.pr_scaled for r in pr)
    # dangling loss + truncation only ever LOWER the total
    assert total <= 1_000_000_000
    assert total > 500_000_000  # and never collapse it

    # Q4: every priority bucket present has n_orders >= 1 and the semi
    # join can never exceed the date-window order count.
    q4 = get_query("q_tpch_q4").fn(spark, sf).collect()
    assert q4 and all(r.n_orders >= 1 for r in q4)
    n_window = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .filter("o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'")
        .count()
    )
    assert sum(r.n_orders for r in q4) <= n_window

    # Q13: custdist sums to the customer count (zero bucket included).
    q13 = get_query("q_tpch_q13").fn(spark, sf).collect()
    n_cust = spark.read.parquet(f"{sf}/customer.parquet").count()
    assert sum(r.custdist for r in q13) == n_cust


def test_tpch_suite_and_cdc_invariants(spark):
    """Invariants for Q7/Q15/Q17/Q22, the bitmap distinct, and the
    streaming CDC apply."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # Q7: only the two nations appear, on both sides, never self-pairs.
    q7 = get_query("q_tpch_q7").fn(spark, sf).collect()
    assert q7
    for r in q7:
        assert {r.supp_nation, r.cust_nation} == {"NATION_3", "NATION_7"}
        assert r.supp_nation != r.cust_nation
        assert r.l_year in (1996, 1997)

    # Q15: all returned suppliers share the (single) maximal revenue.
    q15 = get_query("q_tpch_q15").fn(spark, sf).collect()
    assert len({r.total_revenue for r in q15}) == 1

    # Q17: selected item count is a subset of the brand's lineitems.
    q17 = get_query("q_tpch_q17").fn(spark, sf).collect()[0]
    assert q17.n_items >= 0

    # Q22: every segment count positive; customers are recent-order-free
    # by construction (oracle-checked) — here check totals are positive.
    for r in get_query("q_tpch_q22").fn(spark, sf).collect():
        assert r.n_custs >= 1 and r.total_acctbal > 0

    # bitmap distinct == naive countDistinct
    got = {
        r.event_type: r.n_users
        for r in get_query("q_sketch_bitmap_distinct").fn(spark, sf).collect()
    }
    exp = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exp

    # CDC apply: n_updates sums to the event count; keys are unique.
    cdc = get_query("stream_cdc_apply").fn(spark, sf).collect()
    keys = [(r.user_id, r.event_type) for r in cdc]
    assert len(keys) == len(set(keys))
    assert sum(r.n_updates for r in cdc) == spark.read.parquet(
        f"{sf}/events.parquet"
    ).count()


def test_maxsim_and_pyds_invariants(spark):
    """Invariants for q_sim_maxsim and the custom Python DataSource."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # MaxSim: scores bounded by 4 (sum of 4 cosines <= 4), rank is
    # 1..k consistent with descending score, query doc excluded.
    rows = sorted(get_query("q_sim_maxsim").fn(spark, sf).collect(), key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.mv_doc != 0
        assert -4.0 <= r.maxsim_score <= 4.0
    for a, b in zip(rows, rows[1:]):
        assert a.maxsim_score >= b.maxsim_score

    # Python DataSource: the custom read round-trips the native read
    # exactly (row-group partition assignment loses/dupes nothing).
    from jsmr_spark import pyds

    pyds.register(spark)
    custom = (
        spark.read.format(pyds.PYDS_NAME)
        .option("path", f"{sf}/documents.parquet")
        .load()
    )
    native = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    assert custom.count() == native.count()
    assert sorted(map(tuple, custom.collect())) == sorted(map(tuple, native.collect()))
    # genuinely partition-parallel
    assert custom.rdd.getNumPartitions() == pyds.PYDS_PARALLELISM


def test_reachability_invariants(spark):
    """BFS sanity: source at distance 0; distances within the hop
    bound; every other reached node has an in-edge from a node one hop
    closer (certificate check against a recomputed strong-edge set)."""
    from pyspark.sql import functions as FF

    from jsmr_spark.queries.graph import REACH_MAX_HOPS, REACH_SRC
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    rows = get_query("q_graph_reachability").fn(spark, sf).collect()
    dist = {r.n_name: r.dist for r in rows}
    assert dist[f"NATION_{REACH_SRC}"] == 0
    assert all(0 <= d <= REACH_MAX_HOPS for d in dist.values())
    assert len(rows) == len(dist)  # one row per nation
    assert sorted(dist.values())[0] == 0 and list(dist.values()).count(0) == 1


def test_variant_and_observe_invariants(spark):
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # variant: per-type sums consistent with direct JSON extraction
    rows = get_query("q_json_variant").fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.min_k <= r.max_k
        assert r.min_k * r.n_events <= r.sum_k <= r.max_k * r.n_events

    # observe: scan-side metrics dominate filter-side ones
    m = get_query("q_observe_metrics").fn(spark, sf).collect()[0]
    assert m.n_selected <= m.n_scanned
    assert m.selected_cents <= m.scanned_cents
    assert m.n_scanned == spark.read.parquet(f"{sf}/orders.parquet").count()


def test_point_in_time_join_invariants(spark):
    """No leakage: each observation's joined state must be the state of
    the LAST history change at or before the observation ts (checked
    against a per-user python replay), and at most one row per
    observation."""
    from collections import defaultdict

    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    rows = get_query("q_join_point_in_time").fn(spark, sf).collect()
    assert rows
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))

    ev = sorted(
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id", "user_id", "event_type", "ts")
        .collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    hist = defaultdict(list)
    for r in ev:
        if r.event_id % 10 != 0:
            if not hist[r.user_id] or hist[r.user_id][-1][1] != r.event_type:
                hist[r.user_id].append((r.ts, r.event_type))
    expected = {}
    for r in ev:
        if r.event_id % 10 == 0:
            past = [s for s in hist[r.user_id] if s[0] <= r.ts]
            if past:
                expected[r.event_id] = past[-1][1]
    assert {r.event_id: r.state for r in rows} == expected


def test_curation_funnel_partitions_corpus(spark):
    """First-fail attribution must PARTITION the corpus: per-rule
    counts sum to the non-benchmark doc count, and rule labels come
    from the fixed five-rule vocabulary. (The exact-dup rule fires 0
    at the small SFs — the fixtures have no byte-identical texts below
    sf0.1, where 8 duplicate groups exist and the rule is exercised.)"""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    rows = get_query("q_curation_funnel").fn(spark, sf).collect()
    allowed = {"1_exact_dup", "2_too_short", "3_repetitious", "4_contaminated", "5_pass"}
    assert {r.rule for r in rows} <= allowed
    n_corpus = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter("doc_id % 100 <> 7")
        .count()
    )
    assert sum(r.n_docs for r in rows) == n_corpus


def test_q8_q21_invariants(spark):
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # Q8: market share is a valid fraction per year, years in window.
    for r in get_query("q_tpch_q8").fn(spark, sf).collect():
        assert r.o_year in (1996, 1997)
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.n_items >= 1

    # Q21: ranks 1..k consistent with numwait desc; suppliers unique.
    rows = sorted(get_query("q_tpch_q21").fn(spark, sf).collect(), key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert len({r.s_name for r in rows}) == len(rows)
    for a, b in zip(rows, rows[1:]):
        assert a.numwait >= b.numwait


def test_interpolation_invariants(spark):
    """Interpolated values lie between their anchors; observed hours
    keep their exact totals; the spine covers hours x types exactly."""
    from collections import defaultdict

    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    rows = get_query("q_ts_interpolate").fn(spark, sf).collect()
    per_type = defaultdict(list)
    for r in rows:
        per_type[r.event_type].append(r)
    spine_sizes = {len(v) for v in per_type.values()}
    assert len(spine_sizes) == 1  # identical spine per type
    for rs in per_type.values():
        rs.sort(key=lambda r: r.bucket)
        observed = [(i, r.value) for i, r in enumerate(rs) if not r.filled]
        for i, r in enumerate(rs):
            if r.filled and r.value is not None:
                prev = max((o for o in observed if o[0] < i), key=lambda o: o[0])
                nxt = min((o for o in observed if o[0] > i), key=lambda o: o[0])
                lo, hi = sorted((prev[1], nxt[1]))
                assert lo - 1e-6 <= r.value <= hi + 1e-6
            if r.filled and r.value is None:
                # only at the edges: no anchor on one side
                assert not any(o[0] < i for o in observed) or not any(
                    o[0] > i for o in observed
                )


def test_embed_stats_and_pca_invariants(spark):
    import math

    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # stats: 64 dims, variance >= 0, min <= mean <= max, counts equal.
    stats = get_query("q_embed_stats").fn(spark, sf).collect()
    assert len(stats) == 64
    n_vecs = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    for r in stats:
        assert r.n_vals == n_vecs
        assert r.variance >= 0
        assert r.min_val - 1e-4 <= r.mean <= r.max_val + 1e-4

    # PCA: 64 components; renormalized scale — max |component| == 1e6;
    # direction must align with the dominant Gram axis (positive
    # Rayleigh quotient under the exact quantized Gram).
    pca = get_query("q_embed_pca_power").fn(spark, sf).collect()
    assert len(pca) == 64
    comps = {r.dim: r.component_scaled for r in pca}
    assert max(abs(v) for v in comps.values()) == 1_000_000
    assert math.isfinite(sum(v * v for v in comps.values()))


def test_timeseries_lakehouse_runtime_filter_invariants(spark):
    """Algebraic invariants for the rolling-analytics / lakehouse /
    runtime-filter keys, independent of the oracle's concrete values."""
    from pyspark.sql import functions as F

    from jsmr_spark.queries.timeseries import EWMA_K
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    events = spark.read.parquet(f"{sf}/events.parquet")
    n_events = events.count()
    vlo, vhi = events.agg(F.min("value"), F.max("value")).first()

    # EWMA: one row per event; den is exactly 2^K - 2^(K-n); the
    # weighted average stays inside the observed value range.
    ewma = get_query("q_ts_ewma").fn(spark, sf).collect()
    assert len(ewma) == n_events
    for r in ewma:
        assert 1 <= r.n_win <= EWMA_K
        assert r.ewma_den == (1 << EWMA_K) - (1 << (EWMA_K - r.n_win))
        assert vlo - 1e-3 <= r.ewma <= vhi + 1e-3

    # z-score: every flagged row is >= 3 sigma (up to presentation
    # rounding) and flags are a strict subset of the stream.
    zs = get_query("q_ts_zscore").fn(spark, sf).collect()
    assert 0 < len(zs) < n_events
    for r in zs:
        assert abs(r.z) >= 2.9999

    # rolling distinct: DAU never exceeds WAU; stickiness in (0, 1];
    # one row per distinct active day.
    rd = get_query("q_win_rolling_distinct").fn(spark, sf).collect()
    n_days = events.select(F.to_date("ts")).distinct().count()
    assert len(rd) == n_days
    for r in rd:
        assert 1 <= r.dau <= r.wau
        assert 0.0 < r.stickiness <= 1.0

    # bloom runtime filter: exactly the plain semi-join aggregate (the
    # false-positive recheck must be lossless both directions).
    from jsmr_spark.compat import cents
    from jsmr_spark.queries.runtime_filter import SEGMENT

    orders = spark.read.parquet(f"{sf}/orders.parquet")
    keys = (
        spark.read.parquet(f"{sf}/customer.parquet")
        .where(F.col("c_mktsegment") == SEGMENT)
        .select("c_custkey")
    )
    expected = {
        (r.month, r.n_orders, r.sum_cents)
        for r in orders.join(
            keys, orders.o_custkey == keys.c_custkey, "left_semi"
        )
        .select(
            F.date_trunc("month", "o_orderdate").alias("month"),
            cents(F.col("o_totalprice")).alias("pc"),
        )
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("pc").alias("sum_cents"))
        .collect()
    }
    got = {
        (r.month, r.n_orders, r.sum_cents)
        for r in get_query("q_join_bloom").fn(spark, sf).collect()
    }
    assert got == expected

    # incremental agg: merged state+delta equals the full recompute.
    full = {
        (r.o_orderpriority, r.o_orderstatus, r.n_orders, r.sum_cents)
        for r in orders.select(
            "o_orderpriority", "o_orderstatus", cents(F.col("o_totalprice")).alias("pc")
        )
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("pc").alias("sum_cents"))
        .collect()
    }
    inc = {
        (r.o_orderpriority, r.o_orderstatus, r.n_orders, r.sum_cents)
        for r in get_query("q_incremental_agg").fn(spark, sf).collect()
    }
    assert inc == full

    # z-order sink: buckets partition the table (row counts sum), ids
    # stay in the 4-bit prefix domain, zone maps are ordered, and the
    # box probe actually prunes (at least one bucket skipped).
    zb = get_query("sink_zorder").fn(spark, sf).collect()
    assert sum(r.n_rows for r in zb) == orders.count()
    assert all(0 <= r.zbucket < 16 for r in zb)
    for r in zb:
        assert r.min_day <= r.max_day and r.min_cents <= r.max_cents
    assert any(not r.scanned for r in zb), "probe box pruned nothing"


def test_sampling_geo_cluster_window_invariants(spark):
    """Invariants for the sampling / spatial / clustering / ntile keys."""
    from pyspark.sql import functions as F

    from jsmr_spark.queries.ml_cluster import KM_DIMS, KM_K
    from jsmr_spark.queries.sampling_geo import GEO_RADIUS, SAMPLE_K
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # reservoir sample: <= K rows per group, ranks are 1..n_g, and the
    # same sample comes back on a second run (determinism).
    s1 = get_query("q_sample_reservoir").fn(spark, sf).collect()
    per_lang = {}
    for r in s1:
        per_lang.setdefault(r.lang, []).append(r.rank)
    for lang, ranks in per_lang.items():
        assert len(ranks) <= SAMPLE_K
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    s2 = get_query("q_sample_reservoir").fn(spark, sf).collect()
    assert {(r.lang, r.doc_id, r.rank) for r in s1} == {
        (r.lang, r.doc_id, r.rank) for r in s2
    }

    # geo grid join: ordered pairs, distances within the radius, and
    # the blocked candidate set loses nothing vs a direct check on a
    # sampled pair subset (dist_m consistent with the coordinates).
    geo = get_query("q_geo_gridjoin").fn(spark, sf).collect()
    assert geo, "no proximity pairs at this sf"
    for r in geo:
        assert r.user_a < r.user_b
        assert 0 <= r.dist_m <= GEO_RADIUS

    # triangles: every node's count is positive, and the global sum is
    # divisible by 3 (each triangle contributes exactly 3 corners).
    tri = get_query("q_graph_triangles").fn(spark, sf).collect()
    assert tri, "triangle graph is empty — radius too sparse for this sf"
    assert sum(r.n_triangles for r in tri) % 3 == 0
    for r in tri:
        assert r.n_triangles >= 1

    # k-means: k x dims rows, cluster sizes partition the corpus and
    # are constant across a cluster's dims; means inside value range.
    km = get_query("q_kmeans_lloyd").fn(spark, sf).collect()
    n_vecs = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    sizes = {}
    dims_per_cid = {}
    for r in km:
        sizes.setdefault(r.cid, set()).add(r.n_points)
        dims_per_cid[r.cid] = dims_per_cid.get(r.cid, 0) + 1
        assert -1.0 <= r.mean_val <= 1.0
    assert all(len(v) == 1 for v in sizes.values())
    assert sum(next(iter(v)) for v in sizes.values()) == n_vecs
    assert set(dims_per_cid.values()) == {KM_DIMS}
    assert len(sizes) <= KM_K

    # ntile: 4 quartiles per type, counts differ by at most 1, value
    # ranges ordered across quartiles.
    nt = get_query("q_win_ntile").fn(spark, sf).collect()
    by_type = {}
    for r in nt:
        by_type.setdefault(r.event_type, []).append(r)
    for rows in by_type.values():
        rows.sort(key=lambda r: r.quartile)
        assert [r.quartile for r in rows] == [1, 2, 3, 4]
        counts = [r.n_events for r in rows]
        assert max(counts) - min(counts) <= 1
        for lo, hi in zip(rows, rows[1:]):
            assert lo.max_cents <= hi.min_cents


def test_phash_and_stream_ewma_invariants(spark):
    """Invariants for the perceptual-hash grouping and the streaming
    EWMA's batch-equivalence contract."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # phash: 16-bit domain, one row per document, group sizes are
    # consistent (sum of per-group size over distinct hashes == docs).
    ph = get_query("q_multimodal_phash").fn(spark, sf).collect()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(ph) == n_docs
    groups = {}
    for r in ph:
        assert 0 <= r.phash < (1 << 16)
        groups.setdefault(r.phash, []).append(r.n_same)
    for phash, sizes in groups.items():
        assert sizes == [len(sizes)] * len(sizes)

    # stream EWMA: one converged row per user, window bounded by K,
    # and every (n_win, ewma) pair appears among the batch q_ts_ewma
    # rows for that user — the stream state can only ever BE one of
    # the batch window values (the per-user differential oracle pins
    # it to the last one specifically).
    batch = {}
    for r in get_query("q_ts_ewma").fn(spark, sf).collect():
        batch.setdefault(r.user_id, set()).add((r.n_win, r.ewma))
    stream = {
        r.user_id: (r.n_win, r.ewma)
        for r in get_query("stream_ewma").fn(spark, sf).collect()
    }
    assert set(stream) == set(batch)
    for uid, pair in stream.items():
        assert 1 <= pair[0] <= 20
        assert pair in batch[uid]

    # NULL-aware NOT IN: the fixture must actually produce NULL probe
    # keys (or the three-valued-logic branch is untested), and kept +
    # excluded-by-match + excluded-as-NULL partitions the orders.
    naaj = get_query("q_join_null_aware").fn(spark, sf).collect()[0]
    n_orders = spark.read.parquet(f"{sf}/orders.parquet").count()
    assert naaj.n_null_probes > 0
    assert 0 < naaj.n_kept <= n_orders - naaj.n_null_probes


def test_vector_pipeline_invariants(spark):
    """The vector-pipeline composite must really trim (fence excludes a
    nonzero minority), partition the survivors across clusters, and
    keep per-group means inside the corpus norm range."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    rows = get_query("q_pipeline_vectors").fn(spark, sf).collect()
    n_total = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    kept = sum(r.n_vecs for r in rows)
    assert 0 < kept < n_total, "outlier fence trimmed nothing (or everything)"
    assert kept >= 0.8 * n_total, "fence should keep the bulk of the corpus"
    assert {r.cid for r in rows} <= set(range(4))
    for r in rows:
        assert r.n_vecs >= 1
        assert r.mean_sq_norm > 0.0


def test_cms_and_weighted_sample_invariants(spark):
    """Round-6 sketch/sampling keys.

    CMS: the count-min estimate NEVER undercounts (min over D counters,
    each a superset sum of the true count) — the defining sketch
    invariant; top-15 true counts are in non-increasing order of cnt
    and each estimate is bounded by the total token count.

    Weighted sample: ranks are exactly 1..K under the (priority,
    doc_id) total order, priorities are the exact integer u*2^14 DIV w,
    and the selection is invariant under repartitioning (the
    reproducibility contract rand() cannot give).
    """
    from jsmr_spark.queries.sampling_geo import PRI_SCALE, WEIGHTED_K
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    rows = get_query("q_sketch_cms_topk").fn(spark, sf).collect()
    assert len(rows) == 15
    total_tokens = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.explode(F.split("text", " ")))
        .count()
    )
    for r in rows:
        assert r.cms_est >= r.cnt, (r.token, r.cnt, r.cms_est)
        assert r.overcount == r.cms_est - r.cnt
        assert r.cms_est <= total_tokens
    cnts = sorted((r.cnt for r in rows), reverse=True)
    top15 = [r.cnt for r in sorted(rows, key=lambda r: (-r.cnt, r.token))]
    assert top15 == cnts

    ws = get_query("q_sample_weighted").fn(spark, sf)
    rows = sorted(ws.collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, WEIGHTED_K + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a.priority, a.doc_id) < (b.priority, b.doc_id)
    # priority recomputes from the hash and the weight, exactly
    import hashlib

    for r in rows:
        u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:12], 16)
        assert r.priority == (u * PRI_SCALE) // r.n_tokens
    # independent model: the K winners are exactly the K smallest
    # (priority, doc_id) pairs computed row-by-row in pure Python
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    model = sorted(
        (
            (
                int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:12], 16)
                * PRI_SCALE
            )
            // len(d.text.split(" ")),
            d.doc_id,
        )
        for d in docs
    )[:WEIGHTED_K]
    assert [(r.priority, r.doc_id) for r in rows] == model


def test_weighted_median_ldiv_interval_invariants(spark):
    """Round-6 batch 3 keys, each checked against an independent model.

    Weighted median: recompute per flag in pure Python from the raw
    rows (sort by exact cents, walk cumulative quantity) — the lower
    weighted median must match exactly.

    l-diversity: every reported group really has < L distinct leading
    tokens, and every group is also k-small or k-large independently
    (l-diversity is not implied by k-anonymity).

    Interval join: per-window session counts equal a brute-force theta
    join computed driver-side from the session_window aggregate.
    """
    from collections import defaultdict
    from datetime import timedelta

    from jsmr_spark.queries.joins import IVL_WIN_MIN
    from jsmr_spark.queries.lakehouse import LDIV_L
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # weighted median vs pure-Python model
    rows = get_query("q_agg_weighted_median").fn(spark, sf).collect()
    li = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    groups = defaultdict(lambda: defaultdict(int))
    for r in li:
        cents_v = int(round(r.l_extendedprice * 100))
        groups[r.l_returnflag][cents_v] += int(r.l_quantity)
    for r in rows:
        wmap = groups[r.l_returnflag]
        total = sum(wmap.values())
        cum = 0
        med = None
        for price in sorted(wmap):
            cum += wmap[price]
            if 2 * cum >= total:
                med = price
                break
        assert r.w_median == med / 100.0, r.l_returnflag
        assert r.total_qty == total

    # l-diversity: verify the distinct-topic count per reported group
    ld = get_query("q_privacy_ldiv").fn(spark, sf).collect()
    assert ld, "no small-diversity groups at this SF"
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    topics = defaultdict(set)
    sizes = defaultdict(int)
    for d in docs:
        key = (d.lang, d.source, d.n_chars // 100)
        topics[key].add(d.text.split(" ")[0])
        sizes[key] += 1
    reported = {(r.lang, r.source, r.len_bucket) for r in ld}
    for r in ld:
        key = (r.lang, r.source, r.len_bucket)
        assert len(topics[key]) == r.n_topics < LDIV_L
        assert sizes[key] == r.n_docs
    for key, tset in topics.items():
        assert (len(tset) < LDIV_L) == (key in reported), key

    # interval join vs brute-force theta join over the session table —
    # iterating the FULL generated spine, not just the windows the
    # query returned, so a window whose sessions were all dropped by
    # the bucket blocking cannot pass vacuously
    from datetime import datetime

    from jsmr_spark.queries.joins import IVL_SPINE_END, IVL_SPINE_START

    iv = {
        r.window_start: (r.n_sessions, r.n_users)
        for r in get_query("q_join_interval").fn(spark, sf).collect()
    }
    sess = (
        spark.read.parquet(f"{sf}/events.parquet")
        .groupBy(F.session_window(F.col("ts"), "10 minutes").alias("w"), "user_id")
        .count()
        .select(F.col("w.start").alias("s"), F.col("w.end").alias("e"), "user_id")
        .collect()
    )
    spine_start = datetime.fromisoformat(IVL_SPINE_START)
    spine_end = datetime.fromisoformat(IVL_SPINE_END)
    brute = {}
    w0 = spine_start
    while w0 <= spine_end:
        w1 = w0 + timedelta(minutes=IVL_WIN_MIN)
        hits = [r for r in sess if r.s < w1 and w0 < r.e]
        if hits:
            brute[w0] = (len(hits), len({r.user_id for r in hits}))
        w0 += timedelta(hours=1)
    assert iv == brute


def test_chi2_matches_python_model(spark):
    """chi2 / dof / Cramer's V recompute exactly (to the 4dp policy)
    from the raw contingency table in pure Python."""
    from collections import Counter
    from math import sqrt

    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    (row,) = get_query("q_stats_chi2").fn(spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("lang", "source").collect()
    cells = Counter((d.lang, d.source) for d in docs)
    rt = Counter(); ct = Counter()
    for (l, s), o in cells.items():
        rt[l] += o
        ct[s] += o
    n = sum(cells.values())
    chi2 = sum(
        (o - rt[l] * ct[s] / n) ** 2 / (rt[l] * ct[s] / n)
        for (l, s), o in cells.items()
    )
    dof = (len(rt) - 1) * (len(ct) - 1)
    assert row.n == n and row.n_cells == len(cells) and row.dof == dof
    assert abs(row.chi2 - chi2) < 1e-3
    assert abs(row.cramers_v - sqrt(chi2 / (n * min(len(rt) - 1, len(ct) - 1)))) < 1e-3
    assert row.chi2 >= 0 and 0.0 <= row.cramers_v <= 1.0


# --- round-6 late-batch brute-force references -----------------------


def _tmp_table_dir(spark, name, rows, schema):
    import os
    import tempfile
    import uuid

    d = os.path.join(tempfile.gettempdir(), f"jsmr_prop_{uuid.uuid4().hex[:8]}")
    spark.createDataFrame(rows, schema).write.parquet(os.path.join(d, f"{name}.parquet"))
    return d


doc_texts = st.lists(
    st.lists(st.sampled_from("abcd"), min_size=5, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


@given(texts=doc_texts)
@settings(**SETTINGS)
def test_containment_matches_set_model(spark, texts):
    """q_text_containment == the literal set-theory definition computed
    in Python over every ordered doc pair."""
    import shutil

    from jsmr_spark.queries.dedup_extra import CONT_DEN, CONT_NUM, CONT_SHINGLE
    from jsmr_spark.registry import get_query

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    d = _tmp_table_dir(
        spark, "documents", rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    try:
        got = {
            (r.doc_a, r.doc_b): (r.n_shared, r.n_a)
            for r in get_query("q_text_containment").fn(spark, d).collect()
        }
        sh = {}
        for i, t in enumerate(texts):
            toks = t.split(" ")
            sh[i] = {
                " ".join(toks[j : j + CONT_SHINGLE])
                for j in range(len(toks) - CONT_SHINGLE + 1)
            }
        exp = {}
        for a in sh:
            for b in sh:
                if a == b or not sh[a]:
                    continue
                inter = len(sh[a] & sh[b])
                if inter and CONT_DEN * inter >= CONT_NUM * len(sh[a]):
                    exp[(a, b)] = (inter, len(sh[a]))
        assert got == exp
    finally:
        shutil.rmtree(d, ignore_errors=True)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),            # user
        st.integers(min_value=0, max_value=200),          # minutes offset
        st.sampled_from(["click", "purchase", "view"]),
        st.integers(min_value=0, max_value=9),            # k (channel seed)
    ),
    min_size=1,
    max_size=30,
)


@given(evs=events_strategy)
@settings(**SETTINGS)
def test_attribution_matches_sequential_model(spark, evs):
    """q_attribution_last_touch == a literal per-purchase scan of the
    click history (7-day lookback, (ts, event_id) order, last wins)."""
    import datetime as dt
    import shutil
    from collections import defaultdict

    from jsmr_spark.registry import get_query

    t0 = dt.datetime(2024, 1, 10)
    rows = [
        (eid + 1, t0 + dt.timedelta(minutes=mins), u, typ, 7.25, '{"k": "%d"}' % k)
        for eid, (u, mins, typ, k) in enumerate(evs)
    ]
    d = _tmp_table_dir(
        spark, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    try:
        got = {
            r.channel: (r.n_purchases, r.revenue_cents)
            for r in get_query("q_attribution_last_touch").fn(spark, d).collect()
        }
        exp = defaultdict(lambda: [0, 0])
        for eid, ts, u, typ, _v, _p in rows:
            if typ != "purchase":
                continue
            clicks = [
                (cts, ceid, kk)
                for (ceid, cts, cu, ctyp, _cv, kk) in [
                    (r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows
                ]
                if cu == u and ctyp == "click"
                and (cts, ceid) < (ts, eid)
                and cts >= ts - dt.timedelta(days=7)
            ]
            if clicks:
                _, _, props = max(clicks)
                import json
                ch = "ch%d" % (int(json.loads(props)["k"]) % 5)
            else:
                ch = "direct"
            exp[ch][0] += 1
            exp[ch][1] += 725
        assert got == {k: tuple(v) for k, v in exp.items()}
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(evs=events_strategy)
@settings(**SETTINGS)
def test_auc_matches_pair_counting(spark, evs):
    """q_ml_auc == literal Mann-Whitney pair counting (wins + half
    ties over all pos x neg pairs)."""
    import datetime as dt
    import shutil

    from jsmr_spark.registry import get_query

    t0 = dt.datetime(2024, 1, 10)
    rows = [
        (eid + 1, t0, u, typ, float(mins) / 4, "{}")
        for eid, (u, mins, typ, _k) in enumerate(evs)
    ]
    pos = [v for (_, _, _, typ, v, _) in rows if typ == "purchase"]
    neg = [v for (_, _, _, typ, v, _) in rows if typ == "view"]
    if not pos or not neg:
        return
    d = _tmp_table_dir(
        spark, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    try:
        r = get_query("q_ml_auc").fn(spark, d).collect()[0]
        u2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
        assert (r.n_pos, r.n_neg, r.u2) == (len(pos), len(neg), u2)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_round9_batch_key_invariants(spark):
    """Algebraic invariants for the round-9 additions (suffix census,
    fertility, top-n-gram cover, connected components, ANN tuning
    curve) — facts that must hold regardless of the oracle's values."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # suffix census: groups only, min-keeper, counts consistent. The
    # sf0.001/sf0.01 census is legitimately EMPTY (no shared-suffix
    # groups exist there — CHECKS_r11.md batch-2 note), which would make
    # the loop vacuous (VERDICT r10 #5) — so run at the group-bearing
    # sf0.1 scale and require rows.
    from tests.conftest import SF01_DIR

    sfx_rows = get_query("q_dedup_suffix").fn(spark, SF01_DIR).collect()
    assert sfx_rows, "sf0.1 must contain shared-suffix groups (8 expected)"
    for r in sfx_rows:
        assert r.n_docs >= 2
        assert 1 <= r.n_sources <= r.n_docs
        assert r.total_chars > 0

    # fertility: a whitespace word contains >= 1 BPE run and runs never
    # span spaces, so fertility >= 1.0; chars-per-token >= 1 likewise
    fert = get_query("q_text_fertility").fn(spark, sf).collect()
    assert fert
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    assert sum(r.n_docs for r in fert) == docs.count()
    for r in fert:
        assert r.fertility_ppm >= 1_000_000
        assert r.chars_per_token_ppm >= 1_000_000
        assert r.total_bpe_tokens >= r.total_words

    # top-n-gram cover: one row per multi-token doc, count bounds,
    # flag consistency
    cover = get_query("q_text_top_ngram_cover").fn(spark, sf).collect()
    n_multi = docs.filter("size(split(text, ' ')) >= 2").count()
    assert len(cover) == n_multi
    for r in cover:
        assert 1 <= r.n_occ <= r.n_bigrams
        assert r.flagged == (r.cover_ppm > 200_000)

    # connected components: census partitions the node set; the
    # pointer-jumping implementation must agree with the plain
    # min-propagation helper (cross-implementation check)
    from jsmr_spark.queries.pipeline import connected_components
    from jsmr_spark.queries.sampling_geo import geo_pairs
    from pyspark.sql import functions as F

    cc = get_query("q_graph_concomp").fn(spark, sf).collect()
    n_users = (
        spark.read.parquet(f"{sf}/events.parquet").select("user_id").distinct().count()
    )
    assert sum(r.n_nodes for r in cc) == n_users
    assert len({r.comp for r in cc}) == len(cc)
    for r in cc:
        # the canonical label is a member (min), so it contributes to
        # the id sum; singletons carry no edges
        assert r.sum_ids >= r.comp
        if r.n_nodes == 1:
            assert r.n_edges == 0 and r.sum_ids == r.comp
    pairs = geo_pairs(spark, sf).select(
        F.col("user_a").alias("src"), F.col("user_b").alias("dst")
    )
    ref = {
        (row.lbl, row.n)
        for row in connected_components(pairs)
        .groupBy("lbl")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # helper omits edgeless nodes; the key reports them as singletons
    got = {(r.comp, r.n_nodes) for r in cc if r.n_nodes > 1 or (r.comp, 1) in ref}
    assert ref == got, f"CC implementations disagree: {ref ^ got}"

    # ANN tuning curve: nested probe lists under one total order make
    # candidates AND hits monotone non-decreasing in n_probe
    tune = sorted(
        get_query("q_sim_ann_tune").fn(spark, sf).collect(),
        key=lambda r: r.n_probe,
    )
    assert [r.n_probe for r in tune] == [1, 2, 4]
    assert len({r.n_queries for r in tune}) == 1
    for lo, hi in zip(tune, tune[1:]):
        assert lo.total_cand <= hi.total_cand
        assert lo.total_hits <= hi.total_hits
        assert lo.recall_ppm <= hi.recall_ppm
    for r in tune:
        assert 0 <= r.recall_ppm <= 1_000_000


def test_multiprobe_dominates_single_probe(spark):
    """Multi-probe LSH candidates are a superset of the single-probe
    bucket's, so under the shared total order its recall and candidate
    count must dominate q_sim_ann_lsh's."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    single = get_query("q_sim_ann_lsh").fn(spark, sf).collect()
    multi = get_query("q_sim_ann_multiprobe").fn(spark, sf).collect()
    assert multi
    r_multi = multi[0].recall_at_10
    assert 0.0 <= r_multi <= 1.0
    assert len({r.n_cand for r in multi}) == 1
    if single:
        assert r_multi >= single[0].recall_at_10
        assert multi[0].n_cand >= len(single)


def test_neyman_allocation_sums_to_budget(spark):
    """Largest-remainder rounding must spend EXACTLY the budget, never
    over-allocate a stratum past its size, and pin membership."""
    from jsmr_spark.queries.sampling_geo import NEYMAN_BUDGET
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    rows = get_query("q_sample_neyman").fn(spark, sf).collect()
    assert rows
    assert sum(r.n_alloc for r in rows) == NEYMAN_BUDGET
    for r in rows:
        assert r.n_kept == min(r.n_alloc, r.n_h)
        assert r.w_milli > 0
        if r.n_kept:
            assert r.kept_id_sum > 0


def test_band_tune_nesting_monotone(spark):
    """With a shared 16-perm signature, a (4x4) band collision implies
    collisions in both covering (8x2) bands — candidate sets nest, so
    candidates/hits/recall are monotone in band count."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    rows = {
        (r.n_bands, r.rows_per_band): r
        for r in get_query("q_dedup_band_tune").fn(spark, sf).collect()
    }
    assert set(rows) == {(8, 2), (4, 4), (2, 8)}
    assert len({r.n_truth for r in rows.values()}) == 1
    wide, mid, narrow = rows[(8, 2)], rows[(4, 4)], rows[(2, 8)]
    assert wide.n_cand >= mid.n_cand >= narrow.n_cand
    assert wide.n_hits >= mid.n_hits >= narrow.n_hits
    for r in rows.values():
        assert r.n_hits <= r.n_cand
        assert r.n_hits <= r.n_truth


def test_roc_curve_monotone_in_threshold(spark):
    """Raising the threshold can only shrink the predicted-positive
    set: TPR and FPR are non-increasing in thr_cents, quadrants sum to
    the same population everywhere, and the quadrants must agree with
    q_ml_auc's positive/negative totals."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    rows = sorted(
        get_query("q_ml_roc_curve").fn(spark, sf).collect(),
        key=lambda r: r.thr_cents,
    )
    assert [r.thr_cents for r in rows] == list(range(1000, 9001, 1000))
    pops = {(r.tp + r.fn, r.fp + r.tn) for r in rows}
    assert len(pops) == 1
    auc = get_query("q_ml_auc").fn(spark, sf).collect()[0]
    assert pops == {(auc.n_pos, auc.n_neg)}
    for lo, hi in zip(rows, rows[1:]):
        assert hi.tp <= lo.tp and hi.fp <= lo.fp
        if lo.tpr_ppm is not None and hi.tpr_ppm is not None:
            assert hi.tpr_ppm <= lo.tpr_ppm
        if lo.fpr_ppm is not None and hi.fpr_ppm is not None:
            assert hi.fpr_ppm <= lo.fpr_ppm


def test_round10_batch_key_invariants(spark):
    """Algebraic invariants for the round-10 additions (DSIR selection,
    sequence-packing census, watermark detection) — facts that must
    hold regardless of the oracle's values."""
    from jsmr_spark.queries.pipeline import PACK_CTX
    from jsmr_spark.queries.sampling_geo import DSIR_TARGET, DSIR_TOP
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # DSIR: dense unique ranks, weights non-increasing in rank, and the
    # selection skews toward the target domain (that is the POINT of
    # importance resampling: target-like docs score the highest)
    dsir = sorted(
        get_query("q_sample_dsir").fn(spark, sf).collect(), key=lambda r: r.rnk
    )
    assert [r.rnk for r in dsir] == list(range(1, DSIR_TOP + 1))
    for a, b in zip(dsir, dsir[1:]):
        assert (a.weight_micro, -a.doc_id) >= (b.weight_micro, -b.doc_id)
    assert all(r.n_grams >= 1 for r in dsir)
    n_target = sum(1 for r in dsir if r.lang == DSIR_TARGET)
    assert n_target > DSIR_TOP // 2, f"target slice only {n_target}/{DSIR_TOP}"

    # packing census: window count is exactly ceil(total/CTX), waste is
    # the last window's slack, split rate bounded by doc count, and the
    # corpus token total is conserved across sources
    pack = get_query("q_pack_sequences").fn(spark, sf).collect()
    assert pack
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    corpus_toks = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("s")
    ).collect()[0].s
    assert sum(r.total_tokens for r in pack) == corpus_toks
    for r in pack:
        assert r.n_windows == -(-r.total_tokens // PACK_CTX)
        assert 0 <= r.tail_waste_tokens < PACK_CTX
        assert r.tail_waste_tokens == r.n_windows * PACK_CTX - r.total_tokens
        assert 0 <= r.split_docs <= r.n_docs
        assert r.split_ppm == r.split_docs * 1_000_000 // r.n_docs
        assert r.docs_per_window_milli == r.n_docs * 1_000 // r.n_windows

    # watermark: natural text sits near 500000 ppm green; the flag
    # column and max_z must tell the same story row by row
    wm = get_query("q_text_watermark_detect").fn(spark, sf).collect()
    assert wm
    for r in wm:
        assert 0 <= r.n_flagged <= r.n_docs
        assert (r.n_flagged > 0) == (r.max_z > 4.0)
        assert 350_000 < r.green_ppm < 650_000, r


def test_round10_batch2_key_invariants(spark):
    """Algebraic invariants for the second round-10 batch (embedding
    Gramian, per-source KL, Mann-Whitney U)."""
    import math

    from jsmr_spark.queries.similarity import GRAM_DIMS, _Q_SCALE
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # Gramian: exactly the upper triangle, one shared n, diagonal cells
    # positive (sum of squares), and Cauchy-Schwarz on every off-diag
    gram = {(r.dim_i, r.dim_j): r for r in
            get_query("q_embed_gram").fn(spark, sf).collect()}
    assert len(gram) == GRAM_DIMS * (GRAM_DIMS + 1) // 2
    assert all(i <= j for i, j in gram)
    ns = {r.n_vecs for r in gram.values()}
    assert len(ns) == 1
    for (i, j), r in gram.items():
        if i == j:
            assert r.sum_xy_q > 0
        else:
            assert (r.sum_xy_q * r.sum_xy_q
                    <= gram[(i, i)].sum_xy_q * gram[(j, j)].sum_xy_q)
        assert abs(r.second_moment
                   - round(r.sum_xy_q / r.n_vecs / _Q_SCALE / _Q_SCALE, 4)) \
            <= 1e-9

    # KL: non-negative by clamp, zero only if a source IS the blend;
    # n_grams conserved vs the bigram census
    kl = get_query("q_mix_kl_divergence").fn(spark, sf).collect()
    assert kl and all(r.kl_micronat >= 0 for r in kl)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    total_bigrams = docs.select(
        F.sum(F.greatest(F.size(F.split(F.col("text"), " ")) - 1, F.lit(0)))
        .alias("s")
    ).collect()[0].s
    assert sum(r.n_grams for r in kl) == total_bigrams

    # Mann-Whitney: U bounds, z recomputable from the emitted exact
    # integers, and U1 + U2 = n1*n2 (the rank-sum identity)
    mw = get_query("q_stats_mannwhitney").fn(spark, sf).collect()[0]
    assert 0 <= mw.u_x2 <= 2 * mw.n_purchase * mw.n_view
    n = mw.n_purchase + mw.n_view
    var = (mw.n_purchase * mw.n_view / 12.0
           * ((n + 1) - mw.tie_correction / (n * (n - 1.0))))
    z = ((mw.u_x2 - mw.n_purchase * mw.n_view) / 2.0) / math.sqrt(var)
    assert abs(mw.z - round(z, 4)) <= 1e-9
    # tie-term int64 budget headroom (ADVICE r10 / docstring bound):
    # every per-cent-value tie group must sit >=1000x under the
    # t < 2,097,152 per-term bound, and the exact tie sum >=1000x under
    # 2^63 — so Spark's silent wrap and DuckDB's overflow raise are both
    # unreachable on the fixture by three orders of magnitude.
    from pyspark.sql import functions as _F
    from jsmr_spark.io import load_table as _lt
    _tmax = (
        _lt(spark, sf, "events")
        .where(_F.col("event_type").isin("purchase", "view"))
        .groupBy(_F.round(_F.col("value") * 100).cast("long"))
        .count()
        .agg(_F.max("count"))
        .collect()[0][0]
    )
    assert _tmax < 2_097_152 // 1000
    assert mw.tie_correction < 2**63 // 1000


def test_round10_batch3_key_invariants(spark):
    """Algebraic invariants for the third round-10 batch (degree
    assortativity, average precision, MAD outlier census)."""
    from jsmr_spark.queries.timeseries import MAD_K
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # assortativity: r recomputable from the emitted exact moments and
    # bounded to [-1, 1]; directed-edge count is even (both directions)
    a = get_query("q_graph_assortativity").fn(spark, sf).collect()[0]
    assert a.m_directed % 2 == 0
    num = a.m_directed * a.sum_deg_prod - a.sum_deg * a.sum_deg
    den = a.m_directed * a.sum_deg_sq - a.sum_deg * a.sum_deg
    assert den > 0
    assert abs(a.assortativity - round(num / den, 4)) <= 1e-9
    assert -1.0 <= a.assortativity <= 1.0

    # average precision: bounded by the best and worst rankings —
    # AP >= base rate (random baseline is P/N; any census ordering
    # dominates the worst case P/N at the floor) and AP <= 1
    ap = get_query("q_ml_average_precision").fn(spark, sf).collect()[0]
    n = ap.n_pos + ap.n_neg
    assert 0 < ap.ap_ppm <= 1_000_000
    assert ap.ap_ppm >= ap.n_pos * 1_000_000 // n - 1  # >= base rate - 1ulp
    assert ap.n_thresholds > 0

    # MAD: median/MAD are members of the value/deviation domains,
    # outliers bounded, ppm consistent; at least half the mass lies
    # within MAD of the median (the defining property)
    rows = get_query("q_ts_mad_outliers").fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.mad_cents >= 0
        assert 0 <= r.n_outliers < r.n_events / 2 + 1
        assert r.outlier_ppm == r.n_outliers * 1_000_000 // r.n_events
    # recompute one type end-to-end in pandas
    import pandas as pd  # noqa: F401
    ev = (spark.read.parquet(f"{sf}/events.parquet")
          .select("event_type", "value").toPandas())
    ev["vc"] = (ev.value * 100).round().astype("int64")
    for r in rows[:2]:
        g = ev[ev.event_type == r.event_type].vc.sort_values().reset_index(drop=True)
        k = (len(g) + 1) // 2
        med = int(g.iloc[k - 1])
        assert med == r.median_cents
        dv = (g - med).abs().sort_values().reset_index(drop=True)
        assert int(dv.iloc[k - 1]) == r.mad_cents
        assert int((dv > MAD_K * r.mad_cents).sum()) == r.n_outliers


def test_round11_key_invariants(spark):
    """Algebraic invariants for the round-11 additions (eval-side
    tokenizer-aware decontamination, cross-snapshot dedup census)."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # eval decontamination: every benchmark doc graded; counts bounded
    # and ppm/dirty recomputable from the exact integers; the eval
    # slice is exactly the doc_id % 100 == 7 residue class
    from jsmr_spark.queries.text_extra import BENCH_MOD, BENCH_RESIDUE, DIRTY_PPM
    rows = get_query("q_text_decontam_eval").fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.doc_id % BENCH_MOD == BENCH_RESIDUE
        assert 0 <= r.n_contaminated <= r.n_grams and r.n_grams >= 1
        assert r.contamination_ppm == r.n_contaminated * 1_000_000 // r.n_grams
        assert r.dirty == (r.contamination_ppm >= DIRTY_PPM)

    # snapshot-delta dedup: verbatim re-ingests (bucket >= 95) MUST be
    # flagged as duplicates of the live snapshot and suffixed re-ingests
    # (90-94) must be fresh — recompute the census end-to-end from the
    # fixture and require equality, so the key can never pass vacuously
    import duckdb
    rows = get_query("q_dedup_snapshot_delta").fn(spark, sf).collect()
    assert rows and sum(r.n_added for r in rows) > 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    from jsmr_spark.queries.dedup import _SD_BUCKET_DUCK
    expected = {
        (s or ""): (int(nv), int(nu))
        for s, nv, nu in con.execute(
            f"SELECT source, "
            f"sum(CASE WHEN {_SD_BUCKET_DUCK} >= 95 THEN 1 ELSE 0 END), "
            f"sum(CASE WHEN {_SD_BUCKET_DUCK} >= 90 AND {_SD_BUCKET_DUCK} < 95 "
            f"THEN 1 ELSE 0 END) "
            f"FROM documents GROUP BY source"
        ).fetchall()
    }
    for r in rows:
        nv, nu = expected[r.source or ""]
        assert r.n_added == nv + nu
        # every verbatim re-ingest duplicates its carried origin
        # (bucket >= 95 is outside the 5-14 edit range, so the origin
        # text is carried verbatim); ' u2'-suffixed adds are fresh
        # unless the fixture coincidentally holds the suffixed text
        assert r.n_dup_prior >= nv
        assert r.n_fresh <= nu
        assert r.n_carried > 0
        if r.n_added:
            assert r.dup_ppm == r.n_dup_prior * 1_000_000 // r.n_added
        else:
            assert r.dup_ppm is None


def test_kruskal_invariants(spark):
    """q_stats_kruskal: H recomputable from the emitted exact integers,
    and the whole statistic recomputable end-to-end in pandas (midrank
    convention) within the micro-quantization tolerance."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    kw = get_query("q_stats_kruskal").fn(spark, sf).collect()[0]
    assert kw.n_groups >= 2
    # identity: h4 from the emitted order-free integer term sum
    n = kw.n_total
    h = 12.0 * kw.sum_term_q / 1e6 / (n * (n + 1.0))
    assert abs(kw.h4 - round(h, 4)) <= 1e-9
    hc = h / (1.0 - kw.tie_term / (float(n) * n * n - n))
    assert abs(kw.hc4 - round(hc, 4)) <= 1e-9
    assert kw.h4 >= 0 and kw.hc4 >= kw.h4  # tie correction divides by <= 1
    # end-to-end pandas recompute (scipy-free): midranks via average rank
    ev = (spark.read.parquet(f"{sf}/events.parquet")
          .select("event_type", "value").toPandas())
    ev["vc"] = (ev.value * 100).round().astype("int64")
    ranks = ev.vc.rank(method="average")
    n_py = len(ev)
    grand = (n_py + 1) / 2.0
    h_py = 0.0
    for _, g in ev.assign(rk=ranks).groupby("event_type"):
        h_py += len(g) * (g.rk.mean() - grand) ** 2
    h_py *= 12.0 / (n_py * (n_py + 1.0))
    assert n_py == n
    assert abs(h_py - h) <= 1e-3  # micro-floor quantization bound


def test_levene_invariants(spark):
    """q_stats_levene (Brown-Forsythe): F recomputable from the emitted
    exact micro-unit sums, and the whole statistic recomputable
    end-to-end in pandas with the same lower-median convention."""
    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    bf = get_query("q_stats_levene").fn(spark, sf).collect()[0]
    assert bf.n_groups >= 2
    k, n = bf.n_groups, bf.n_total
    f_id = ((n - k) / (k - 1.0)) * (bf.between_q / float(bf.within_q))
    assert abs(bf.f4 - round(f_id, 4)) <= 1e-9
    assert bf.f4 >= 0 and bf.between_q >= 0 and bf.within_q > 0
    # end-to-end pandas recompute (scipy-free)
    ev = (spark.read.parquet(f"{sf}/events.parquet")
          .select("event_type", "value").toPandas())
    ev["vc"] = (ev.value * 100).round().astype("int64")
    zs, n_py = [], 0
    for _, g in ev.groupby("event_type"):
        v = g.vc.sort_values().reset_index(drop=True)
        med = int(v.iloc[(len(v) + 1) // 2 - 1])  # lower median by rank
        zs.append((v - med).abs())
        n_py += len(v)
    assert n_py == n and len(zs) == k
    grand = sum(z.sum() for z in zs) / n_py
    between = sum(len(z) * (z.mean() - grand) ** 2 for z in zs)
    within = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f_py = ((n_py - k) / (k - 1.0)) * (between / within)
    assert abs(f_py - f_id) <= 1e-3  # unit-floor quantization bound


def test_round12_key_invariants(spark):
    """Algebraic + end-to-end invariants for the round-12 additions
    (ExactSubstr duplicated-span census, cross-snapshot MinHash)."""
    import duckdb

    from jsmr_spark.registry import get_query

    from tests.conftest import SF_DIR as sf

    # --- q_dedup_exact_substr: pure-Python end-to-end recompute -------
    # Tokenize, slide W-grams (raw strings — STRICTER than the engines'
    # 48-bit keys: a hash collision would surface as a diff here),
    # mark grams occurring >= 2 times corpus-wide, union the
    # equal-length intervals per doc, and require the per-source census
    # to match Spark EXACTLY.
    from jsmr_spark.queries.dedup_extra import EXSUB_W

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, coalesce(source, '') AS source, text FROM "
        f"read_parquet('{sf}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    counts: dict = {}
    doc_grams = {}
    tot = {}
    for doc_id, source, text in docs:
        tk = text.split(" ")
        nd, tt = tot.get(source, (0, 0))
        tot[source] = (nd + 1, tt + len(tk))
        grams = [
            " ".join(tk[i : i + EXSUB_W])
            for i in range(len(tk) - EXSUB_W + 1)
        ]
        doc_grams[(doc_id, source)] = grams
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
    exp = {}
    for (doc_id, source), grams in doc_grams.items():
        starts = [i for i, g in enumerate(grams) if counts[g] >= 2]
        if not starts:
            continue
        cover = EXSUB_W + sum(
            min(EXSUB_W, b - a) for a, b in zip(starts, starts[1:])
        )
        h, c = exp.get(source, (0, 0))
        exp[source] = (h + 1, c + cover)
    rows = get_query("q_dedup_exact_substr").fn(spark, sf).collect()
    assert rows and any(r.n_docs_hit > 0 for r in rows)
    for r in rows:
        src = r.source or ""
        nd, tt = tot[src]
        h, c = exp.get(src, (0, 0))
        assert (r.n_docs, r.total_tokens) == (nd, tt)
        assert (r.n_docs_hit, r.dup_token_cover) == (h, c), src
        assert r.cover_ppm == c * 1_000_000 // tt
        # every hit doc's union contains at least one full window
        assert c >= EXSUB_W * h and c <= tt

    # --- q_dedup_snapshot_minhash: counts identity + lower bounds -----
    # Verbatim re-ingests (bucket >= 95) have IDENTICAL signatures to
    # their carried original -> every band collides -> always a
    # candidate, and exact Jaccard is 1.0: they MUST all be flagged
    # near-dups. Exact-content dups (snapshot_delta's n_dup_prior) are
    # a subset of near-dups for the same reason.
    from jsmr_spark.queries.dedup import _SD_BUCKET_DUCK

    mh_rows = {
        (r.source or ""): r
        for r in get_query("q_dedup_snapshot_minhash").fn(spark, sf).collect()
    }
    assert mh_rows and sum(r.n_near_prior for r in mh_rows.values()) > 0
    verbatim = {
        (s or ""): int(nv)
        for s, nv in con.execute(
            f"SELECT source, sum(CASE WHEN {_SD_BUCKET_DUCK} >= 95 "
            f"THEN 1 ELSE 0 END) FROM read_parquet('{sf}/documents.parquet') "
            f"GROUP BY source"
        ).fetchall()
    }
    for src, r in mh_rows.items():
        assert r.n_added == r.n_near_prior + r.n_fresh
        assert r.near_ppm == r.n_near_prior * 1_000_000 // r.n_added
        assert r.n_near_prior >= verbatim.get(src, 0), src
    delta_rows = {
        (r.source or ""): r
        for r in get_query("q_dedup_snapshot_delta").fn(spark, sf).collect()
    }
    for src, r in mh_rows.items():
        assert r.n_near_prior >= delta_rows[src].n_dup_prior, src
