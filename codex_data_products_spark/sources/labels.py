"""Adjacency-labels reader — SURVEY.md §2.1 S6 / §2.9 W1.

Whitespace-delimited, headerless, one cell id per line; the line order
defines the MatrixMarket matrix positions (bin/concatenate.py:314-329;
the reference builds ``label_to_index_map`` then subtracts 1 for 0-base).
Here positions stay explicit data — a (pos, cell_id) frame joined against
the edge endpoints instead of a driver-side dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.sources.positional_text import (
    read_lines_with_positions,
)


def read_labels(
    spark: SparkSession, path: str, with_source_file: bool = False
) -> DataFrame:
    """(pos, cell_id): pos is the 1-based line position — the same
    coordinate space as MatrixMarket indices, so no ±1 adjustment is
    needed when joining edges to labels (the reference converts both to
    0-base instead, bin/concatenate.py:322-329)."""
    lines = read_lines_with_positions(spark, path)
    out = lines.select(
        "source_file",
        F.col("pos"),
        F.col("line").alias("cell_id"),
    )
    return out if with_source_file else out.drop("source_file")


def remap_edges_to_cell_ids(
    edges: DataFrame, labels: DataFrame, keep: DataFrame | None = None
) -> DataFrame:
    """W1: positions → cell ids, with optional endpoint filtering.

    ``edges``: (i, j, weight) 1-based positions; ``labels``: (pos,
    cell_id); ``keep``: optional (cell_id) frame — an edge survives only
    if BOTH endpoints are kept, replicating the reference's semi-filter
    + reindex of the sparse matrix (bin/concatenate.py:318-330).
    """
    src = labels.select(
        F.col("pos").alias("i"), F.col("cell_id").alias("src_cell_id")
    )
    dst = labels.select(
        F.col("pos").alias("j"), F.col("cell_id").alias("dst_cell_id")
    )
    out = edges.join(src, "i").join(dst, "j").select(
        "src_cell_id", "dst_cell_id", "weight"
    )
    if keep is not None:
        k_src = keep.select(F.col("cell_id").alias("src_cell_id"))
        k_dst = keep.select(F.col("cell_id").alias("dst_cell_id"))
        out = out.join(k_src, "src_cell_id", "left_semi").join(
            k_dst, "dst_cell_id", "left_semi"
        )
    return out
