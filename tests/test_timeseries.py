"""Generic resample/gap-fill operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from codex_data_products_spark.operators.timeseries import resample


def test_resample_fills_gaps_per_group(spark):
    t = lambda h: dt.datetime(2026, 1, 1, h)  # noqa: E731
    df = spark.createDataFrame(
        [
            ("a", t(10), 1.0),
            ("a", t(10), 2.0),
            ("a", t(13), 4.0),  # 11:00 and 12:00 are gaps for a
            ("b", t(11), 8.0),
        ],
        "grp string, ts timestamp, v double",
    )
    out = resample(
        df,
        "ts",
        "1 hour",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("v")},
        group_cols=["grp"],
        fill={"n": 0, "total": 0.0},
    )
    rows = {
        (r["grp"], r["bucket_start"].hour): (r["n"], r["total"])
        for r in out.collect()
    }
    # dense: every group × every hour in [10, 13]
    assert len(rows) == 2 * 4
    assert rows[("a", 10)] == (2, 3.0)
    assert rows[("a", 11)] == (0, 0.0)
    assert rows[("a", 12)] == (0, 0.0)
    assert rows[("a", 13)] == (1, 4.0)
    assert rows[("b", 11)] == (1, 8.0)
    assert rows[("b", 10)] == (0, 0.0)


def test_resample_without_groups(spark):
    t = lambda m: dt.datetime(2026, 1, 1, 9, m)  # noqa: E731
    df = spark.createDataFrame(
        [(t(0), 1.0), (t(31), 2.0)], "ts timestamp, v double"
    )
    out = resample(df, "ts", "15 minutes", aggs={"n": F.count(F.lit(1))})
    got = {r["bucket_start"].minute: r["n"] for r in out.collect()}
    assert got == {0: 1, 15: None, 30: 1}
