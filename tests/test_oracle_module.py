"""The shipped comparison core (codex_data_products_spark.oracle) must
be order-insensitive, column-order-insensitive, and strict on real
differences — it is the product's own correctness gate, so it gets its
own tests (pure pandas, no Spark)."""

from __future__ import annotations

import math

import pandas as pd

from codex_data_products_spark.oracle import compare_frames


def test_row_and_column_order_insensitive():
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = pd.DataFrame({"y": ["c", "a", "b"], "x": [3, 1, 2]})
    assert compare_frames(a, b) == []


def test_detects_value_difference():
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1, 3]})
    problems = compare_frames(a, b)
    assert problems and "values differ" in problems[0]


def test_detects_row_count_difference():
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1]})
    assert any("row counts differ" in p for p in compare_frames(a, b))


def test_detects_column_difference():
    a = pd.DataFrame({"x": [1]})
    b = pd.DataFrame({"z": [1]})
    assert any("columns differ" in p for p in compare_frames(a, b))


def test_nan_and_none_unify():
    # engines disagree on NULL float representation (None vs NaN);
    # the comparator must treat them as the same missing value
    a = pd.DataFrame({"x": [1.0, float("nan")]})
    b = pd.DataFrame({"x": [1.0, None]})
    assert compare_frames(a, b) == []


def test_float_repr_exactness():
    # repr-based float comparison: last-ulp differences MUST fail
    # (that is the strictness the cross-engine determinism rules exist for)
    x = 0.1 + 0.2
    a = pd.DataFrame({"x": [x]})
    b = pd.DataFrame({"x": [0.3]})
    assert math.isclose(x, 0.3) and compare_frames(a, b) != []


def test_list_cells_compare_elementwise():
    a = pd.DataFrame({"x": [[1, 2], [3]]})
    b = pd.DataFrame({"x": [[3], [1, 2]]})
    assert compare_frames(a, b) == []
    c = pd.DataFrame({"x": [[2, 1], [3]]})
    assert compare_frames(a, c) != []


def test_verify_queries_records_error_and_continues(spark, monkeypatch):
    """A query that raises mid-sweep (e.g. a result too large to
    materialize at an extreme stress SF) must land as an `error:` row
    for ITS name while the rest of the sweep still runs."""
    from codex_data_products_spark import registry
    from codex_data_products_spark.oracle import verify_queries

    registry.load_all()

    def boom(spark, sf_dir):
        raise RuntimeError("simulated oversized result")

    monkeypatch.setitem(registry.QUERIES, "agg_distinct", boom)
    out = verify_queries(
        spark,
        "/root/testdata/sf0.001",
        ["agg_distinct", "filter_predicates"],
    )
    assert out["agg_distinct"] == [
        "error: simulated oversized result"
    ]
    assert out["filter_predicates"] == []


# --- distributed fingerprint compare (VERDICT r6 #2) ------------------------


def test_ieee_canonicalization_is_cross_engine_exact(spark):
    """The double canonicalization (sign, exponent, mantissa52 via exact
    power-of-two arithmetic) must be byte-identical between Spark and
    DuckDB across the full exponent range, subnormals included, plus the
    printf trap values (0.1 pads differently under Java vs C — the
    reason this decomposition exists), negative zero, ties, and NaN/inf/
    NULL — and injective (distinct doubles -> distinct strings)."""
    import duckdb

    from codex_data_products_spark.oracle import _duck_canon, _spark_canon
    from pyspark.sql import functions as F

    vals = [
        0.1, 0.3, 1 / 3, 1e-300, 1e300, 2.0 ** -1030, 5e-324,
        1.7976931348623157e308, 2.2250738585072014e-308, -0.0, 0.0,
        123456789.123456789, 1.0, -2.0, math.pi, 0.30000000000000004,
        float("nan"), float("inf"), float("-inf"), None,
    ]
    vals += [1.5 * 2.0 ** e for e in range(-1073, 1024, 97)]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    canon_s = [
        r[0]
        for r in sdf.select(
            _spark_canon(F.col("x"), sdf.schema["x"].dataType)
        ).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    canon_d = [
        r[0]
        for r in con.execute(
            f"SELECT {_duck_canon('x', 'DOUBLE')} FROM t"
        ).fetchall()
    ]
    assert canon_s == canon_d
    # injective over the non-null/nan values (the decomposition IS the
    # bit pattern); nan and NULL intentionally collide (exact-compare
    # parity: pandas can't tell them apart)
    finite = [c for c, v in zip(canon_s, vals)
              if v is not None and not (isinstance(v, float) and math.isnan(v))]
    assert len(set(finite)) == len(set(v for v in vals if v is not None
                                       and not (isinstance(v, float) and math.isnan(v))))


def test_fingerprint_compare_agrees_with_exact(spark, sf_dir):
    """On type-diverse registry queries the digest verdict must agree
    with the exact comparator (MATCH), and a salted oracle must flip it
    to MISMATCH."""
    from codex_data_products_spark import registry
    from codex_data_products_spark.oracle import fingerprint_compare

    registry.load_all()
    for name in ("agg_collect_sorted", "date_functions", "json_extraction"):
        sdf = registry.QUERIES[name](spark, sf_dir)
        assert fingerprint_compare(sdf, registry.ORACLES[name], sf_dir) == []

    sdf = registry.QUERIES["agg_collect_sorted"](spark, sf_dir)
    salted = f"SELECT * FROM ({registry.ORACLES['agg_collect_sorted']}) LIMIT 1"
    problems = fingerprint_compare(sdf, salted, sf_dir)
    assert problems and "differ" in problems[0]


def test_dratio_half_up_ties_cross_engine(spark):
    """compat.dratio must break 6-decimal midpoints HALF_UP identically
    on both engines — including the live sf1.0 catch (14616/230400 =
    0.0634375, which Spark ROUND and DuckDB round() disagree on) — and
    propagate NULL denominators."""
    import duckdb

    from codex_data_products_spark.functions.compat import dratio, sql_dratio
    from pyspark.sql import functions as F

    rows = [
        (14616, 230400),  # the sf1.0 divergence: tie -> 0.063438
        (203, 3200),      # same value, reduced
        (1, 3), (7, 10), (0, 5), (999999, 1000000), (1, 2),
        (5, 10000000),    # 0.0000005: tie at scale 6 -> 0.000001
        (1, None),        # null denominator -> null
    ]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r[0] for r in df.select(dratio(F.col("a"), F.col("b"), 6)).collect()
    ]
    con = duckdb.connect()
    vals = ",".join(
        f"({a},{'NULL' if b is None else b})" for a, b in rows
    )
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_dratio('a', 'b', 6)} FROM (VALUES {vals}) t(a,b)"
        ).fetchall()
    ]
    assert got == want
    assert got[0] == 0.063438 and got[1] == 0.063438  # HALF_UP at the tie
    assert got[7] == 1e-06 and got[8] is None
