"""Per-dataset expression CSV — SURVEY.md §2.1 S3 / §2.6 P3.

``*-cell_channel_total.csv``: header row = ``ID`` + channel names
(bin/concatenate.py:180-184); body = per-cell totals. Each dataset has
its own channel set, so files are read per-dataset and normalized to the
uniform long form before the union (wide→long melt at ingest, SURVEY
§1.1) — the per-dataset *plan construction* is driver-side metadata
work, the data never converges on the driver.
"""

from __future__ import annotations

import csv

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.schemas import EXPRESSION_ID_COL


def read_channel_names(path: str) -> list[str]:
    """Header capture (get_column_names, bin/concatenate.py:180-184):
    all columns except ID, raw (pre-normalization), order-preserving.
    A tiny driver-side metadata read, like a parquet footer."""
    with open(path, newline="") as f:
        header = next(csv.reader(f))
    return [c for c in header if c != EXPRESSION_ID_COL]


def read_expression_wide(spark: SparkSession, path: str) -> DataFrame:
    """One dataset's wide matrix: ID string + double channel columns."""
    df = spark.read.option("header", True).csv(path)
    channels = [c for c in df.columns if c != EXPRESSION_ID_COL]
    return df.select(
        F.col(EXPRESSION_ID_COL).cast("string").alias("original_obs_id"),
        *[F.col(f"`{c}`").cast("double").alias(c) for c in channels],
    )


def melt_expression(wide: DataFrame, value_name: str = "total") -> DataFrame:
    """Wide→long: (original_obs_id, channel, <value_name>). Channel names
    stay raw here; normalization (J4) runs before the cross-dataset
    union, not at scan."""
    channels = [c for c in wide.columns if c != "original_obs_id"]
    return wide.unpivot(
        ids=["original_obs_id"],
        values=channels,
        variableColumnName="channel",
        valueColumnName=value_name,
    )


def read_centers(spark: SparkSession, path: str) -> DataFrame:
    """Cell centers CSV (bin/concatenate.py:281-286)."""
    df = spark.read.option("header", True).csv(path)
    return df.select(
        F.col("ID").cast("string").alias("original_obs_id"),
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
    )
