"""Bucketed and salted join utilities: results AND plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codex_data_products_spark.operators.joins import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "orders_b", "o_orderkey", 8, str(root / "orders_b")
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
        str(root / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # at production fact×fact scale neither side broadcasts; force that
    # regime so the planner actually exercises the bucketed path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan  # the whole point of bucketing
    # and it still computes the right thing
    n = joined.count()
    want = (
        spark.table(right)
        .join(spark.table(left).select("o_orderkey"), "o_orderkey")
        .count()
    )
    assert n == want


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, orders, "l_orderkey", n_salts=7)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    a = {r["l_orderkey"]: (r["n"], r["q"]) for r in plain.collect()}
    b = {r["l_orderkey"]: (r["n"], r["q"]) for r in salted.collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k int, v string"
    )
    small = spark.createDataFrame([(1, "A")], "k int, w string")
    out = {
        r["k"]: r["w"]
        for r in salted_join(big, small, "k", n_salts=4, how="left").collect()
    }
    assert out == {1: "A", 2: None, 3: None}


def test_generic_asof_join(spark):
    import datetime as dt

    from codex_data_products_spark.operators.joins import asof_join

    t = lambda m: dt.datetime(2026, 1, 1, 12, m)  # noqa: E731
    quotes = spark.createDataFrame(
        [("A", t(0), 10.0), ("A", t(5), 11.0), ("B", t(2), 99.0)],
        "sym string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [("A", t(3), 1), ("A", t(5), 2), ("A", t(7), 3), ("B", t(1), 4)],
        "sym string, ts timestamp, trade_id int",
    )
    strict = {
        r["trade_id"]: r["asof_px"]
        for r in asof_join(
            trades, quotes, "sym", right_value_cols=["px"]
        ).collect()
    }
    # trade 2 at 12:05 must NOT see the co-timed 12:05 quote (strict <)
    assert strict == {1: 10.0, 2: 10.0, 3: 11.0, 4: None}
    inclusive = {
        r["trade_id"]: r["asof_px"]
        for r in asof_join(
            trades, quotes, "sym", right_value_cols=["px"], strict=False
        ).collect()
    }
    assert inclusive == {1: 10.0, 2: 11.0, 3: 11.0, 4: None}


def test_bloom_sketch_no_false_negatives(spark):
    """Bloom contract: every build key survives the probe; false
    positives are possible but bounded, and an exact join clears them."""
    from codex_data_products_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )
    from pyspark.sql import functions as F

    build = spark.range(0, 200, 3).select(F.col("id").alias("k"))  # 67 keys
    probe = spark.range(0, 600).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k")
    kept = {r["k"] for r in bloom_probe(probe, bloom, "k").collect()}
    truth = {r["k"] for r in build.collect()}
    assert truth <= kept  # no false negatives
    # false-positive rate stays modest for 67 keys in 1024 bits, k=3
    assert len(kept) < 3 * len(truth)
    exact = {
        r["k"]
        for r in bloom_probe(probe, bloom, "k")
        .join(build.withColumnRenamed("k", "bk"), F.col("k") == F.col("bk"), "left_semi")
        .collect()
    }
    assert exact == truth


def test_cms_estimate_never_undercounts(spark):
    """CMS contract: the min-cell estimate upper-bounds every item's
    true frequency, so threshold prefilters keep all true heavy
    hitters; the exact recount clears false positives."""
    from pyspark.sql import functions as F

    from codex_data_products_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    # skewed stream: item i appears (i % 7 + 1) * 3 times
    items = (
        spark.range(0, 50)
        .select(
            F.explode(
                F.array_repeat(
                    F.concat(F.lit("item_"), F.col("id")),
                    ((F.col("id") % 7) + 1).cast("int") * 3,
                )
            ).alias("item")
        )
    )
    truth = {
        r["item"]: r["cnt"]
        for r in items.groupBy("item").agg(F.count("*").alias("cnt")).collect()
    }
    sketch = cms_build(items, "item")
    est = {
        r["item"]: r["cms_est"]
        for r in cms_estimate(
            items.distinct(), sketch, "item"
        ).collect()
    }
    assert set(est) == set(truth)
    for item, true_cnt in truth.items():
        assert est[item] >= true_cnt


def test_merge_into_applies_update_insert_delete(spark):
    from pyspark.sql import functions as F

    from codex_data_products_spark.operators.joins import merge_into

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            (2, "U", 99.0),   # update
            (3, "D", None),   # delete matched
            (9, "I", 5.0),    # insert new key
            (8, "D", None),   # delete unmatched: no-op
            (1, "U", None),   # update with NULL value: keeps base value
        ],
        "ck long, op string, new_bal double",
    )
    out = {
        r["k"]: (r["name"], r["bal"], r["act"])
        for r in merge_into(
            base,
            changes,
            key="k",
            change_key="ck",
            op_col="op",
            set_cols={"bal": "new_bal"},
            insert_defaults={"name": F.lit("new")},
            action_col="act",
        ).collect()
    }
    assert out == {
        1: ("a", 10.0, "updated"),
        2: ("b", 99.0, "updated"),
        4: ("d", 40.0, "kept"),
        9: ("new", 5.0, "inserted"),
    }


def test_symdel_keys_cover_every_distance_one_pair(spark):
    """Deletion-neighborhood completeness on adversarial cases: equal
    strings, single-char, prefix insertion, substitution at each end,
    and a transposition (distance 2 — keys may collide but the
    levenshtein verify must reject it)."""
    from pyspark.sql import functions as F

    from codex_data_products_spark.queries.joins import _deletion_keys

    rows = [
        ("ab",), ("b",), ("a",), ("xab",), ("zb",), ("az",), ("ba",), ("",),
    ]
    df = spark.createDataFrame(rows, "s string").select(
        "s", _deletion_keys(F.col("s")).alias("keys")
    )
    keys = {r["s"]: set(r["keys"]) for r in df.collect()}
    # '' emits itself only
    assert keys[""] == {""}
    # every levenshtein<=1 pair shares a key
    import itertools

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    for s1, s2 in itertools.combinations(keys, 2):
        if lev(s1, s2) <= 1:
            assert keys[s1] & keys[s2], (s1, s2)
