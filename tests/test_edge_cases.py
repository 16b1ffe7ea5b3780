"""Degenerate-input hardening for the library surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from codex_data_products_spark.plans.training_pipeline import (
    CurationConfig,
    curate,
    exact_dedup_keepers,
    neardup_losers,
)
from codex_data_products_spark.queries.dedup import (
    shingle_table,
    simhash_frame,
)
from codex_data_products_spark.sources.labels import remap_edges_to_cell_ids


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_empty_corpus_flows_through_curation(spark):
    empty = _docs(spark, [])
    assert exact_dedup_keepers(empty).count() == 0
    assert neardup_losers(empty, 3).count() == 0
    assert curate(empty, CurationConfig()).count() == 0


def test_single_doc_corpus(spark):
    one = _docs(
        spark,
        [(1, "the quick brown fox jumps over a lazy dog and runs to the "
             "woods while the hunters watch a bird of prey circle")],
    )
    out = curate(one, CurationConfig(min_tokens=5))
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_short_docs_produce_no_shingles(spark):
    docs = _docs(spark, [(1, "one two three"), (2, "a b c d e")])
    # k=5: doc 1 has 3 tokens (none), doc 2 exactly 5 (one shingle)
    got = [(r["doc_id"], r["shingle"]) for r in shingle_table(docs).collect()]
    assert got == [(2, "a b c d e")]


def test_simhash_of_identical_texts_is_equal(spark):
    docs = _docs(spark, [(1, "same text here"), (2, "same text here")])
    sims = {r["doc_id"]: r["simhash"] for r in simhash_frame(docs).collect()}
    assert sims[1] == sims[2]


def test_edge_remap_with_empty_edges(spark):
    labels = spark.createDataFrame(
        [(1, "c1"), (2, "c2")], "pos int, cell_id string"
    )
    edges = spark.createDataFrame([], "i int, j int, weight double")
    assert remap_edges_to_cell_ids(edges, labels).count() == 0


def test_text_ops_handle_empty_string(spark):
    from codex_data_products_spark.operators import text as ot

    df = spark.createDataFrame([(1, ""), (2, "  ")], "doc_id long, text string")
    out = df.select(
        "doc_id",
        ot.token_count().alias("n"),
        ot.fingerprint().alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # split of "" yields [""] → 1 empty token; the point is no crash and
    # deterministic output
    assert by_id[1]["n"] == 1 and by_id[1]["fp"] is not None


def test_curation_is_idempotent(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over a lazy dog and runs to the "
                "woods while the hunters watch a bird of prey circle"),
            (2, "the quick brown fox jumps over a lazy dog and runs to the "
                "woods while the hunters watch a bird of prey circle"),
        ],
    )
    cfg = CurationConfig(min_tokens=5)
    once = curate(docs, cfg).select("doc_id", "text")
    twice = curate(once, cfg).select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_duckdb_list_reduce_struct_acc_aliases_in_place():
    """Documents WHY events_holt_forecast folds a LIST accumulator, not
    a STRUCT: DuckDB v1.0.0's list_reduce updates struct accumulator
    fields in place sequentially, so a later field's expression reads
    the earlier field's NEW value. The crossed-reference probe returns
    the corrupted (4, 4) under struct state but the correct (4, 12)
    under list state. If this test ever fails on the struct side, the
    engine fixed the aliasing and the struct form becomes usable."""
    import duckdb

    con = duckdb.connect()
    corrupted = con.execute(
        """SELECT list_reduce(
          [{'v': CAST(1 AS DOUBLE), 'p': CAST(1 AS DOUBLE), 'q': CAST(10 AS DOUBLE)},
           {'v': CAST(2 AS DOUBLE), 'p': CAST(0 AS DOUBLE), 'q': CAST(0 AS DOUBLE)},
           {'v': CAST(3 AS DOUBLE), 'p': CAST(0 AS DOUBLE), 'q': CAST(0 AS DOUBLE)}],
          (acc, e) -> {'v': e.v, 'p': acc.q + e.v, 'q': acc.p})"""
    ).fetchone()[0]
    # true left fold: step1 p=12,q=1; step2 p=4,q=12
    assert (corrupted["p"], corrupted["q"]) == (4.0, 4.0)
    safe = con.execute(
        """SELECT list_reduce(
          [[CAST(1 AS DOUBLE), CAST(1 AS DOUBLE), CAST(10 AS DOUBLE)],
           [CAST(2 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)],
           [CAST(3 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]],
          (acc, e) -> [e[1], acc[3] + e[1], acc[2]])"""
    ).fetchone()[0]
    assert safe == [3.0, 4.0, 12.0]


def _sf_dir_with_documents(tmp_path, rows):
    """A testdata-shaped dir: sf0.001 tables symlinked, documents replaced."""
    import glob
    import os

    import pandas as pd

    for p in glob.glob("/root/testdata/sf0.001/*.parquet"):
        os.symlink(p, tmp_path / os.path.basename(p))
    os.remove(tmp_path / "documents.parquet")
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_boilerplate_short_docs_no_crash(spark, tmp_path):
    """Docs with <4 tokens (incl. empty text → ['']) crashed the gram
    sequence before the short-doc guard (ADVICE r4: F.sequence(1, 0)
    steps -1 and feeds slice a 0 start). Both engines must now agree."""
    from codex_data_products_spark import registry
    from tests.oracle_utils import compare_frames, run_oracle

    registry.load_all()
    rows = [
        (1, "", "en", "s", 0),
        (2, "a b c", "en", "s", 5),
        (3, "x y z w one two", "en", "s", 15),
        (4, "x y z w three", "en", "s", 13),
        (5, "x y z w", "en", "s", 7),
        (6, "   ", "en", "s", 3),
    ]
    d = _sf_dir_with_documents(tmp_path, rows)
    spark_df = registry.QUERIES["text_boilerplate"](spark, d).toPandas()
    oracle_df = run_oracle(registry.ORACLES["text_boilerplate"], d)
    problems = compare_frames(spark_df, oracle_df)
    assert not problems, " | ".join(problems)
    # the gram shared by docs 3/4/5 crosses MIN_DF=3; doc_share is over
    # ALL 6 docs (short ones included in the denominator)
    assert list(spark_df["gram"]) == ["x y z w"]
    assert list(spark_df["df"]) == [3]
    assert abs(spark_df["doc_share"][0] - 0.5) < 1e-9


def test_ewma_segmented_fold_matches_sequential_on_hot_user(spark, tmp_path):
    """Degenerate hot user (VERDICT r4 #1): one bot user with a large
    single-day burst plus multi-day history. The segmented per-day
    (scale, offset) composition must equal the plain sequential fold,
    and per-key aggregation state stays O(days), not O(events)."""
    import glob
    import os

    import pandas as pd

    from codex_data_products_spark import registry
    from tests.oracle_utils import compare_frames, run_oracle

    registry.load_all()
    rows = []
    # bot user 1: 2000 events in one day, then 3 more days of 5 each
    base = pd.Timestamp("2024-03-01 00:00:00")
    eid = 0
    for i in range(2000):
        rows.append((eid, base + pd.Timedelta(seconds=i), 1, "burst",
                     float((i * 37) % 101) / 7.0, "{}"))
        eid += 1
    for day in range(1, 4):
        for i in range(5):
            rows.append((eid,
                         base + pd.Timedelta(days=day, minutes=i),
                         1, "tail", float(i) + 0.25, "{}"))
            eid += 1
    # user 2: single event (exercises the no-composed-map branch)
    rows.append((eid, base, 2, "solo", 9.5, "{}"))
    eid += 1
    # user 3: two events on two days
    rows.append((eid, base, 3, "a", 1.0, "{}"))
    rows.append((eid + 1, base + pd.Timedelta(days=1), 3, "b", 5.0, "{}"))

    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )
    for p in glob.glob("/root/testdata/sf0.001/*.parquet"):
        os.symlink(p, tmp_path / os.path.basename(p))
    os.remove(tmp_path / "events.parquet")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    d = str(tmp_path)

    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in registry.QUERIES["events_ewma"](spark, d).collect()
    }

    # sequential reference fold in plain Python
    def seq_ewma(vals):
        acc = vals[0]
        for v in vals[1:]:
            acc = 0.3 * v + 0.7 * acc
        return acc

    by_user = {}
    for r in sorted(rows, key=lambda r: (r[1], r[0])):
        by_user.setdefault(r[2], []).append(r[4])
    for uid, vals in by_user.items():
        n, ewma = got[uid]
        assert n == len(vals)
        assert abs(ewma - round(seq_ewma(vals), 6)) < 1e-6, uid

    # and the oracle agrees bit-for-bit on the same degenerate corpus
    spark_df = registry.QUERIES["events_ewma"](spark, d).toPandas()
    oracle_df = run_oracle(registry.ORACLES["events_ewma"], d)
    problems = compare_frames(spark_df, oracle_df)
    assert not problems, " | ".join(problems)


def test_contamination_hashed_cap_flags_boilerplate(spark, tmp_path):
    """A shingle shared by most of the test set crosses the 10% DF cap:
    it must be counted as boilerplate, not contamination, and the
    engines must agree on the capped corpus."""
    from codex_data_products_spark import registry
    from tests.oracle_utils import compare_frames, run_oracle

    registry.load_all()
    # doc_id * 2654435761 % 4294967296 % 100 >= 90 → test split; find
    # enough test ids so one 8-gram can cross ceil(0.1 * n_test)
    test_ids = [i for i in range(400) if (i * 2654435761) % 4294967296 % 100 >= 90][:20]
    train_ids = [i for i in range(400) if (i * 2654435761) % 4294967296 % 100 < 90][:10]
    assert len(test_ids) == 20
    boiler = "terms of use apply to all content on this site"  # 10 toks
    rows = []
    for k, did in enumerate(test_ids):
        if k < 5:
            # 5 of 20 test docs share the boilerplate 8-grams (> cap=2)
            rows.append((did, f"unique{k} " + boiler, "en", "s", 10))
        else:
            rows.append((did, f"alpha{k} beta gamma delta epsilon zeta "
                              f"eta theta iota kappa", "en", "s", 10))
    for k, did in enumerate(train_ids):
        rows.append((did, f"alpha{k + 5} beta gamma delta epsilon zeta "
                          f"eta theta iota kappa", "en", "s", 10))
    d = _sf_dir_with_documents(tmp_path, rows)
    spark_df = registry.QUERIES["split_contamination_hashed"](
        spark, d
    ).toPandas()
    oracle_df = run_oracle(
        registry.ORACLES["split_contamination_hashed"], d
    )
    problems = compare_frames(spark_df, oracle_df)
    assert not problems, " | ".join(problems)
    by_doc = spark_df.set_index("doc_id")
    # the 5 sharers: their shared 8-grams crossed the cap → boilerplate
    sharers = [d_ for d_ in test_ids[:5]]
    assert all(by_doc.loc[s, "n_boilerplate"] > 0 for s in sharers)
    # boilerplate is excluded from the contamination numerator
    assert all(by_doc.loc[s, "n_contaminated"] == 0 for s in sharers)


def test_contamination_queries_handle_short_docs(spark, tmp_path):
    """Both contamination audits carried the same clamped-sequence
    crash as text_boilerplate (slice on start 0 for docs with <8
    tokens, including empty text). Short docs must flow through with
    no shingles, matching the oracle, on both variants."""
    from codex_data_products_spark import registry
    from tests.oracle_utils import compare_frames, run_oracle

    registry.load_all()
    rows = [
        (1, "", "en", "s", 0),
        (2, "just seven tokens in this tiny doc", "en", "s", 34),
        (3, "one two three four five six seven eight nine", "en", "s", 44),
        (4, "one two three four five six seven eight nine", "en", "s", 44),
        (5, "   ", "en", "s", 3),
    ]
    d = _sf_dir_with_documents(tmp_path, rows)
    for name in ("split_contamination", "split_contamination_hashed"):
        spark_df = registry.QUERIES[name](spark, d).toPandas()
        oracle_df = run_oracle(registry.ORACLES[name], d)
        problems = compare_frames(spark_df, oracle_df)
        assert not problems, f"{name}: " + " | ".join(problems)


# --- round-5 query additions -------------------------------------------


def _tmp_sf_dir(spark, tmp_path, tables):
    """Write a minimal sf-dir with the given {table: DataFrame}."""
    d = str(tmp_path / "sf")
    for name, df in tables.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{name}.parquet")
    return d


def test_streaks_bot_user_single_day(spark, tmp_path):
    """A bot with thousands of same-day events contributes ONE user-day
    row: its longest streak is 1 regardless of event volume."""
    from codex_data_products_spark.queries.events import events_streaks

    rows = [(i, "2024-03-05 10:%02d:00" % (i % 60), 7, "click", 1.0, "{}")
            for i in range(2000)]
    rows += [(9000 + j, "2024-03-%02d 09:00:00" % (10 + j), 8, "view", 1.0, "{}")
             for j in range(4)]  # user 8: 4 consecutive days
    ev = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = _tmp_sf_dir(spark, tmp_path, {"events": ev})
    got = {r["streak_days"]: r["n_users"]
           for r in events_streaks(spark, d).collect()}
    assert got == {1: 1, 4: 1}


def test_funnel_timing_no_conversions_is_empty(spark, tmp_path):
    """Users who never purchase (or purchase before entry) produce no
    latency rows — the query returns empty rather than crashing on the
    integer-rank arithmetic."""
    from codex_data_products_spark.queries.events import events_funnel_timing

    ev = spark.createDataFrame(
        [
            (1, "2024-01-02 00:00:00", 1, "signup", 1.0, "{}"),
            (2, "2024-01-01 00:00:00", 1, "purchase", 1.0, "{}"),  # before
            (3, "2024-01-03 00:00:00", 2, "click", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = _tmp_sf_dir(spark, tmp_path, {"events": ev})
    assert events_funnel_timing(spark, d).count() == 0


def test_skew_profile_uniform_key_has_zero_gini(spark, tmp_path):
    """A perfectly uniform key distribution has Gini exactly 0 and
    skew_ratio exactly 1 — the closed-form tie-group path covers the
    all-ties case."""
    from codex_data_products_spark.queries.quality import skew_profile

    ev = spark.createDataFrame(
        [(u * 10 + i, "2024-01-01 00:00:00", u, "click", 1.0, "{}")
         for u in range(8) for i in range(5)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    li = spark.createDataFrame(
        [(1, s, 1.0) for s in range(4) for _ in range(3)],
        "l_orderkey long, l_suppkey long, l_quantity double",
    )
    d = _tmp_sf_dir(spark, tmp_path, {"events": ev, "lineitem": li})
    rows = {r["audit_key"]: r for r in skew_profile(spark, d).collect()}
    ev_row = rows["events.user_id"]
    assert ev_row["gini"] == 0.0 and ev_row["skew_ratio"] == 1.0
    assert ev_row["n_keys"] == 8 and ev_row["max_rows"] == 5


def test_length_percentiles_single_doc_per_lang(spark, tmp_path):
    """n=1: every quantile target resolves to the single value (the
    ceil(q·n)=1 boundary of the integer-rank arithmetic)."""
    from codex_data_products_spark.queries.text import text_length_percentiles

    docs = spark.createDataFrame(
        [(1, "abc", "en", "s", 3), (2, "abcdefgh", "zz", "s", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = _tmp_sf_dir(spark, tmp_path, {"documents": docs})
    rows = {r["lang"]: r for r in text_length_percentiles(spark, d).collect()}
    assert rows["en"]["p50_chars"] == rows["en"]["p99_chars"] == 3
    assert rows["zz"]["p50_chars"] == rows["zz"]["p99_chars"] == 8


def test_pca_constant_corpus_degenerate_variance(spark, tmp_path):
    """All-identical vectors: centered data is the zero matrix, so the
    matvec is zero — the guarded normalization must yield zero
    loadings/eigenvalue/share instead of dividing by ||y|| = 0 (this
    crashed with DIVIDE_BY_ZERO before the guard)."""
    from codex_data_products_spark.queries.similarity import (
        embedding_pca_power,
    )

    vecs = spark.createDataFrame(
        [(i, [0.5] * 64, 0) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    )
    d = _tmp_sf_dir(spark, tmp_path, {"embeddings": vecs})
    out = embedding_pca_power(spark, d).collect()
    assert len(out) == 64
    assert all(
        r["loading"] == 0.0
        and r["eigenvalue"] == 0.0
        and r["explained_share"] == 0.0
        for r in out
    )


def test_sample_priority_corpus_smaller_than_k_is_empty(spark, tmp_path):
    """Priority sampling needs the (k+1)-th priority as its threshold;
    with fewer than k+1 docs there is no tau and BOTH engines emit
    zero rows (the SQL's inner join on the rn=k+1 row, the Spark
    side's tau-null filter). Pinned so a refactor can't silently turn
    the degenerate corpus into 'return everything with est=w'."""
    from codex_data_products_spark.queries.sampling import sample_priority

    docs = spark.createDataFrame(
        [(i, "a b c", "en", "s", 5) for i in range(1, 6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = _tmp_sf_dir(spark, tmp_path, {"documents": docs})
    assert sample_priority(spark, d).count() == 0


def test_inverted_index_below_min_df_is_empty(spark, tmp_path):
    """Every term rarer than the df floor: stats filter removes all
    vocab rows, so the index is empty rather than unfiltered."""
    from codex_data_products_spark.queries.text import text_inverted_index

    docs = spark.createDataFrame(
        [(1, "alpha beta", "en", "s", 10), (2, "gamma delta", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = _tmp_sf_dir(spark, tmp_path, {"documents": docs})
    assert text_inverted_index(spark, d).count() == 0


def test_trend_test_monotone_and_flat_series(spark, tmp_path):
    """Hand-checkable Mann-Kendall: a strictly increasing 10-day series
    has S = 45, var_s = 125, z = 44/sqrt(125) > 1.96 ('increasing') and
    Theil-Sen slope exactly 1.0; a constant series is fully tied —
    S = 0, var_s = 0, z = 0, 'no_trend', slope 0."""
    from codex_data_products_spark.queries.events import events_trend_test

    rows = []
    eid = 0
    for i in range(10):  # type 'up': day i has i+1 events
        for _ in range(i + 1):
            rows.append((eid, "2024-03-%02d 09:00:00" % (1 + i), 1, "up",
                         1.0, "{}"))
            eid += 1
    for i in range(10):  # type 'flat': 2 events every day
        for _ in range(2):
            rows.append((eid, "2024-03-%02d 09:00:00" % (1 + i), 2, "flat",
                         1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = _tmp_sf_dir(spark, tmp_path, {"events": ev})
    got = {r["event_type"]: r for r in events_trend_test(spark, d).collect()}
    up, flat = got["up"], got["flat"]
    assert up["s_stat"] == 45 and up["var_s"] == 125.0
    assert abs(up["z_score"] - 44 / 125 ** 0.5) < 1e-6
    assert up["trend"] == "increasing" and up["sen_slope"] == 1.0
    assert flat["s_stat"] == 0 and flat["var_s"] == 0.0
    assert flat["z_score"] == 0.0
    assert flat["trend"] == "no_trend" and flat["sen_slope"] == 0.0


def test_compaction_plan_matches_next_fit_model(spark, tmp_path):
    """Constructed single-partition file list [5,3,3,1], target
    max(5, ceil(12/8)) = 5: NFD packs 5 | 3 | 3+1 -> 3 bins."""
    from codex_data_products_spark.queries.linkage import compaction_plan

    rows = []
    oid = 0
    for day, n in [(1, 5), (2, 3), (3, 3), (4, 1)]:
        for _ in range(n):
            rows.append((oid, 1, "O", 10.0, "2024-03-%02d 00:00:00" % day,
                         "1-URGENT"))
            oid += 1
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    d = _tmp_sf_dir(spark, tmp_path, {"orders": orders})
    (r,) = compaction_plan(spark, d).collect()
    assert r["n_files"] == 4 and r["total_size"] == 12
    assert r["target"] == 5 and r["n_bins"] == 3 and r["files_saved"] == 1
    assert abs(r["fill_pct"] - 12 / 15) < 1e-6


def test_er_fuzzy_join_blocks_and_length_band(spark, tmp_path):
    """'red bolt'~'ted bolt' (dist 1, same block) match; 'red bolt' vs
    'red gear' are in different blocks (no candidate); a same-block
    name beyond the length band is pruned before levenshtein."""
    from codex_data_products_spark.queries.linkage import er_fuzzy_join

    names = (["red bolt"] * 3 + ["ted bolt"] * 2 + ["red gear"] * 4
             + ["extraordinarily bolt"] * 1)
    parts = spark.createDataFrame(
        [(i, n, "B", "T", 1, 1.0) for i, n in enumerate(names)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    d = _tmp_sf_dir(spark, tmp_path, {"part": parts})
    rows = er_fuzzy_join(spark, d).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["dist"] == 1 and r["n_name_pairs"] == 1
    assert r["n_row_pairs"] == 6  # 3 'red bolt' x 2 'ted bolt'


def test_er_blocking_key_single_token_matches_duckdb(spark, tmp_path):
    """A one-token name has no second word: DuckDB's split_part returns
    '' while Spark's split(...).getItem(1) returns NULL — and NULL never
    equi-joins. The blocking key coalesces to '' so single-token names
    block together in BOTH engines: 'bolt'~'bolz' (dist 1) must match."""
    import duckdb

    from codex_data_products_spark.queries.linkage import _ER_SQL, er_fuzzy_join

    names = ["bolt"] * 2 + ["bolz"] * 3 + ["red gear"] * 2
    parts = spark.createDataFrame(
        [(i, n, "B", "T", 1, 1.0) for i, n in enumerate(names)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    d = _tmp_sf_dir(spark, tmp_path, {"part": parts})
    rows = er_fuzzy_join(spark, d).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["dist"] == 1 and r["n_name_pairs"] == 1 and r["n_row_pairs"] == 6

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{d}/part.parquet/*.parquet')"
    )
    oracle = con.execute(_ER_SQL).fetchall()
    assert [(int(a), int(b), int(c)) for a, b, c in oracle] == [(1, 1, 6)]


def test_band_join_boundary_and_cell_crossing(spark, tmp_path):
    """A view exactly eps away qualifies; one microsecond beyond does
    not; a pair straddling a 120 s cell boundary is still found (the
    3-cell expansion covers it)."""
    from codex_data_products_spark.queries.joins import band_join_buckets

    base = "2024-03-01 00:0%d:%02d.%06d"
    rows = [
        # click at exactly t=120s (a cell boundary)
        (1, "2024-03-01 00:02:00.000000", 1, "click", 1.0, "{}"),
        # view 120s BEFORE (previous cell, exactly at eps) -> qualifies
        (2, "2024-03-01 00:00:00.000000", 1, "view", 1.0, "{}"),
        # view 120.000001s before -> excluded
        (3, "2024-02-29 23:59:59.999999", 1, "view", 1.0, "{}"),
        # view 1s after (same cell) -> qualifies, bucket 0
        (4, "2024-03-01 00:02:01.000000", 1, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = _tmp_sf_dir(spark, tmp_path, {"events": ev})
    got = {
        (r["direction"], r["gap_bucket"]): r["n_pairs"]
        for r in band_join_buckets(spark, d).collect()
    }
    assert got == {("view_first", 4): 1, ("click_first", 0): 1}


def test_rake_hand_computed_scores(spark, tmp_path):
    """'deep learning of deep nets': phrases {deep learning, deep nets};
    deep freq 2 deg 4, learning/nets freq 1 deg 2 -> every word scores
    2.0 and both phrases score 4.0, tie broken by phrase text."""
    from codex_data_products_spark.queries.text import text_keyphrase_rake

    docs = spark.createDataFrame(
        [(1, "deep learning of deep nets", "en", "s", 26)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    d = _tmp_sf_dir(spark, tmp_path, {"documents": docs})
    rows = text_keyphrase_rake(spark, d).collect()
    assert [(r["phrase"], r["n_occurrences"], r["n_words"], r["score"])
            for r in rows] == [
        ("deep learning", 1, 2, 4.0),
        ("deep nets", 1, 2, 4.0),
    ]


def test_er_clusters_transitive_chain(spark, tmp_path):
    """A 5-name chain whose ends are 4 edits apart (beyond the pair
    threshold) still closes into ONE entity via transitivity, with the
    minimum name canonical and the convergence audit green."""
    from codex_data_products_spark.queries.linkage import er_clusters

    adjs = ["aaaa", "aaab", "aabb", "abbb", "bbbb"]
    rows = []
    pk = 0
    for adj in adjs:
        for _ in range(2):  # 2 rows per name
            rows.append((pk, f"{adj} bolt", "B", "T", 1, 1.0))
            pk += 1
    parts = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    d = _tmp_sf_dir(spark, tmp_path, {"part": parts})
    rows = er_clusters(spark, d).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["entity"] == "aaaa bolt"
    assert r["n_names"] == 5 and r["n_rows"] == 10
    assert r["converged"] is True


def test_equidepth_uniform_prices_fill_evenly(spark, tmp_path):
    """32 orders at prices 500, 1500, ..., 31500 (one per width-1000
    bucket): every depth bucket holds exactly 2 rows."""
    from codex_data_products_spark.queries.advanced import (
        stats_equidepth_histogram,
    )

    orders = spark.createDataFrame(
        [(i, 1, "O", 500.0 + 1000 * i, "2024-01-01 00:00:00", "1-URGENT")
         for i in range(32)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    d = _tmp_sf_dir(spark, tmp_path, {"orders": orders})
    rows = stats_equidepth_histogram(spark, d).collect()
    assert len(rows) == 16
    assert all(r["n_rows"] == 2 for r in rows)
    assert sorted(r["depth_bucket"] for r in rows) == list(range(16))


def test_watermark_profile_carry_crosses_segment_boundary(spark, tmp_path):
    """An event in a NEW 100k-event_id segment that is older than the
    previous segment's max must be counted late via the cross-segment
    carry (the in-segment window alone would call it in-order)."""
    from codex_data_products_spark.queries.events import (
        events_watermark_profile,
    )

    rows = [
        (99_998, "2024-03-01 10:00:00", 1, "click", 1.0, "{}"),
        (99_999, "2024-03-01 10:05:00", 1, "click", 1.0, "{}"),
        # first event of segment 1: 30 s older than seg-0 max -> late
        (100_000, "2024-03-01 10:04:30", 1, "click", 1.0, "{}"),
        # in-order within segment 1
        (100_001, "2024-03-01 10:06:00", 1, "click", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = _tmp_sf_dir(spark, tmp_path, {"events": ev})
    got = {
        r["lateness"]: r["n_events"]
        for r in events_watermark_profile(spark, d).collect()
    }
    assert got == {"in_order": 3, "le_60s": 1}


def test_scd2_merge_equals_range_join_semantics(spark):
    """The sort-based merge lookup must equal the declarative range
    join (valid_from <= t < valid_to) on both testdata SFs — including
    tie cases where a fact lands exactly on a version boundary."""
    from codex_data_products_spark import registry
    from tests.oracle_utils import compare_frames, run_oracle

    registry.load_all()
    range_join_sql = """
WITH e AS (
  SELECT user_id, event_id, ts, event_type FROM events
),
marked AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT *, sum(chg) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS island
  FROM marked
),
spans AS (
  SELECT user_id, island, min(event_type) AS type_then,
         min(ts) AS valid_from
  FROM islands GROUP BY user_id, island
),
dim AS (
  SELECT user_id, type_then, valid_from,
         lead(valid_from) OVER (
           PARTITION BY user_id ORDER BY valid_from, island
         ) AS valid_to
  FROM spans
),
f AS (
  SELECT user_id, event_type AS type_now,
         ts - INTERVAL 1 HOUR AS t
  FROM events
)
SELECT f.type_now,
       coalesce(d.type_then, 'none') AS type_then,
       CAST(count(*) AS BIGINT) AS n_events
FROM f LEFT JOIN dim d
  ON d.user_id = f.user_id
 AND d.valid_from <= f.t
 AND (d.valid_to IS NULL OR f.t < d.valid_to)
GROUP BY f.type_now, coalesce(d.type_then, 'none')
"""
    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        merge = run_oracle(registry.ORACLES["scd2_asof_lookup"], sf)
        rjoin = run_oracle(range_join_sql, sf)
        assert compare_frames(merge, rjoin) == []


# --- exact substring-span dedup: hand-checked coverage math ----------------


def _substring_docs(spark):
    """Doc 1 and 2 share the 10-token prefix 'a b c d e f g h i j'; doc 3
    is unrelated. With k=8 the shared prefix yields duplicated window
    starts {1, 2, 3} in both docs → one island, coverage pos 1..10 = 10
    tokens. Doc 3 has no duplicated window."""
    shared = "a b c d e f g h i j"
    rows = [
        (1, shared + " unique1a unique1b unique1c unique1d"),
        (2, shared + " other2a other2b other2c other2d other2e"),
        (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_coverage_hand_checked(spark):
    from codex_data_products_spark.queries.dedup import (
        _coverage_per_doc,
        duplicated_positions,
        positional_grams,
    )

    pos = positional_grams(_substring_docs(spark)).persist()
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_fraction"])
        for r in _coverage_per_doc(duplicated_positions(pos)).collect()
    }
    pos.unpersist()
    # windows at pos 1..3 cover tokens 1..10 (first adds 8, next two add
    # 1 each); doc 1 has 14 tokens, doc 2 has 15, doc 3 never appears.
    assert got == {1: (14, 10, 0.714286), 2: (15, 10, 0.666667)}


def test_substring_spans_merge_islands(spark):
    """Two duplicated regions separated by a gap > k must emit two spans
    per doc; overlapping windows within a region merge into one."""
    from codex_data_products_spark.queries.dedup import (
        duplicated_positions,
        positional_grams,
    )
    from codex_data_products_spark.queries.dedup import SUBSTR_K

    head = "h1 h2 h3 h4 h5 h6 h7 h8"          # duplicated 8-gram at pos 1
    tail = "t1 t2 t3 t4 t5 t6 t7 t8 t9"       # duplicated windows at end
    rows = [
        (1, f"{head} fill1a fill1b fill1c fill1d fill1e fill1f fill1g fill1h fill1i {tail}"),
        (2, f"{head} fill2a fill2b fill2c fill2d fill2e fill2f fill2g fill2h fill2i {tail}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pos = positional_grams(docs).persist()
    cov = duplicated_positions(pos)
    from pyspark.sql import Window
    from pyspark.sql import functions as FF

    # reuse the registered query's island construction via the module fn
    from codex_data_products_spark.registry import QUERIES  # noqa: F401

    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = FF.when(
        FF.coalesce(
            FF.col("pos") - FF.lag("pos", 1, None).over(w),
            FF.lit(SUBSTR_K + 1),
        )
        > SUBSTR_K,
        FF.lit(1),
    ).otherwise(FF.lit(0))
    islands = (
        cov.select("doc_id", "pos", brk.alias("brk"))
        .select("doc_id", "pos", FF.sum("brk").over(w).alias("island"))
        .groupBy("doc_id", "island")
        .agg(
            FF.min("pos").alias("span_start"),
            (FF.max("pos") + (SUBSTR_K - 1)).alias("span_end"),
        )
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in islands.collect()
    }
    pos.unpersist()
    # head: window at pos 1 only (pos 2 window spans into unique fill) →
    # span 1..8. tail: 9 tokens → windows at the last two positions of a
    # 26-token doc: pos 18..19 → span 18..26.
    assert got == {
        (1, 1, 8), (1, 18, 26),
        (2, 1, 8), (2, 18, 26),
    }


def test_skyline_tie_semantics(spark):
    """Dominance requires at least one strict inequality: duplicate
    (price, size) points co-survive; an equal-size but cheaper point
    dominates; an incomparable point (cheaper price, larger size)
    survives alongside."""
    from codex_data_products_spark.queries.advanced import _skyline_pass

    rows = [
        (1, 10.0, 5),   # skyline
        (2, 10.0, 5),   # exact tie of 1 → co-survives
        (3, 12.0, 5),   # same size, pricier than 1 → dominated
        (4, 8.0, 9),    # cheaper but larger → incomparable, survives
        (5, 8.0, 11),   # same price as 4, larger → dominated
        (6, 15.0, 4),   # pricier but smallest size → survives
    ]
    df = spark.createDataFrame(rows, "partkey long, price double, size int")
    got = {r["partkey"] for r in _skyline_pass(df).collect()}
    assert got == {1, 2, 4, 6}
    # two-pass (bucketed local + global) must agree with the single pass
    from pyspark.sql import functions as F

    local = _skyline_pass(
        df.withColumn("bucket", F.floor(F.col("price") / 5)), "bucket"
    )
    got2 = {r["partkey"] for r in _skyline_pass(local.drop("bucket")).collect()}
    assert got2 == {1, 2, 4, 6}


def test_substring_trim_removes_exactly_the_spans(spark, tmp_path):
    """Trim applied to the hand-built corpus: the shared 10-token
    prefix disappears from both docs, the unique tails survive
    verbatim (checked by md5 of the expected tail string)."""
    import hashlib

    from codex_data_products_spark.queries.dedup import (
        dedup_substring_trim,
    )

    d = str(tmp_path / "trim_docs")
    _substring_docs(spark).coalesce(1).write.parquet(
        f"{d}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["kept_tokens"], r["trimmed_md5"])
        for r in dedup_substring_trim(spark, d).collect()
    }
    want_tail = {
        1: "unique1a unique1b unique1c unique1d",
        2: "other2a other2b other2c other2d other2e",
    }
    assert set(got) == {1, 2}  # doc 3 has no spans → no trim row
    for doc, tail in want_tail.items():
        n, kept, md5 = got[doc]
        assert kept == n - 10
        assert md5 == hashlib.md5(tail.encode()).hexdigest()


def _sf_dir_with_events(tmp_path, rows):
    """A testdata-shaped dir: sf0.001 tables symlinked, events replaced
    (the oracle runner binds every table view eagerly)."""
    import glob
    import os

    import pandas as pd

    for p in glob.glob("/root/testdata/sf0.001/*.parquet"):
        os.symlink(p, tmp_path / os.path.basename(p))
    os.remove(tmp_path / "events.parquet")
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["event_id"] = pdf["event_id"].astype("int64")
    pdf["user_id"] = pdf["user_id"].astype("int64")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_events_rfm_quintiles_under_five_users(spark, tmp_path):
    """ntile(5) with n < 5 leaves trailing tiles empty; the boundary-
    rank arithmetic must reproduce exactly that (scores 1..n, in the
    (metric, user_id) total order) — and stay oracle-identical."""
    from codex_data_products_spark import registry
    from tests.oracle_utils import compare_frames, run_oracle

    registry.load_all()
    rows = [
        (1, "2024-01-10 00:00:00", 7, "purchase", 10.0, "{}"),
        (2, "2024-01-11 00:00:00", 8, "purchase", 30.0, "{}"),
        (3, "2024-01-12 00:00:00", 9, "purchase", 20.0, "{}"),
        (4, "2024-01-12 00:00:00", 9, "view", 99.0, "{}"),  # ignored
    ]
    d = _sf_dir_with_events(tmp_path, rows)
    pdf = registry.QUERIES["events_rfm"](spark, d).toPandas()
    assert sorted(pdf["r_score"]) == [1, 2, 3]  # empty tiles 4, 5
    problems = compare_frames(pdf, run_oracle(registry.ORACLES["events_rfm"], d))
    assert problems == [], problems


def test_events_rfm_tie_breaks_match_oracle(spark, tmp_path):
    """All users share one frequency/monetary value: quintile edges cut
    INSIDE the tie block, so scores depend purely on the user_id
    tie-break — the exact case a value-only boundary would get wrong."""
    from codex_data_products_spark import registry
    from tests.oracle_utils import compare_frames, run_oracle

    registry.load_all()
    rows = [
        (i, "2024-02-0%d 00:00:00" % (1 + i % 3), 100 + i, "purchase",
         25.0, "{}")
        for i in range(13)
    ]
    d = _sf_dir_with_events(tmp_path, rows)
    got = registry.QUERIES["events_rfm"](spark, d).toPandas()
    assert sorted(got["m_score"].value_counts()) == [2, 2, 3, 3, 3]
    problems = compare_frames(got, run_oracle(registry.ORACLES["events_rfm"], d))
    assert problems == [], problems
