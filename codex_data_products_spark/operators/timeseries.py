"""Time-series operators: resampling with gap fill.

The library form of the registered ``events_gapfill`` query — any
timestamped frame, any bucket width, any aggregate set, zero-filled (or
null-filled) empty buckets. The bucket spine derives from the observed
min/max, so the operator is one aggregate + one tiny broadcast spine
join; nothing driver-side but the interval parse.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts_col: str, seconds: int) -> Column:
    """Epoch-floor bucketing: works for any width, unlike date_trunc."""
    return F.timestamp_seconds(
        (F.unix_timestamp(ts_col) / seconds).cast("long") * seconds
    )


def resample(
    df: DataFrame,
    ts_col: str,
    interval: str,
    aggs: dict[str, Column],
    group_cols: list[str] | None = None,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Dense bucketed aggregation.

    ``interval`` is a pandas-parseable width (e.g. ``"1 hour"``,
    ``"15 minutes"``); every bucket between the observed min and max
    appears for every group, missing buckets filled from ``fill``
    (column → value; unfilled columns stay null). Output: group_cols +
    ``bucket_start`` + one column per agg alias.
    """
    group_cols = group_cols or []
    seconds = int(pd.Timedelta(interval).total_seconds())
    if seconds <= 0:
        raise ValueError(f"non-positive interval {interval!r}")

    bucket = _bucket(ts_col, seconds).alias("bucket_start")
    sparse = df.groupBy(*group_cols, bucket).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )

    bounds = df.agg(
        F.min(ts_col).alias("t_min"), F.max(ts_col).alias("t_max")
    ).select(
        _bucket("t_min", seconds).alias("t0"),
        _bucket("t_max", seconds).alias("t1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr(f"INTERVAL {seconds} SECONDS"))
        ).alias("bucket_start")
    )
    if group_cols:
        groups = df.select(*group_cols).distinct()
        spine = groups.crossJoin(F.broadcast(spine))

    out = spine.join(sparse, [*group_cols, "bucket_start"], "left")
    if fill:
        out = out.na.fill(fill)
    return out
