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
