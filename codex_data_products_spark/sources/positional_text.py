"""Positional text reader: per-file line numbers as data.

Two reference inputs encode meaning in *line position*:
  * the adjacency labels file — line order defines matrix indices
    (bin/concatenate.py:314-329, FIXTURES.md §7);
  * the MatrixMarket header — the first non-comment line is the size
    line (bin/concatenate.py:313, FIXTURES.md §6).

A split text scan cannot guarantee line order across splits, so these
files are read ``wholetext`` (one row per file) and exploded with
``posexplode`` — order is then exact by construction. Per-dataset CODEX
files are product-sized (the reference materializes them fully in RAM,
bin/concatenate.py:374), so one-file-per-task is the correct granularity;
parallelism comes from the number of files, matching the
one-dataset-per-task ingest strategy (SURVEY §4 "Parallelism").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lines_with_positions(spark: SparkSession, path: str) -> DataFrame:
    """(source_file, pos, line): pos is the 1-based line number."""
    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("source_file"), "value"
    )
    lines = files.select(
        "source_file",
        F.posexplode(F.split(F.col("value"), r"\r?\n")).alias("pos0", "line"),
    )
    return (
        lines.filter(F.length(F.trim("line")) > 0)
        .select(
            "source_file",
            (F.col("pos0") + 1).alias("pos"),
            F.trim("line").alias("line"),
        )
    )
