"""Antibodies TSV reader — SURVEY.md §2.1 S2 / §2.5 A5.

Read with explicit line positions so the reference's first-match
semantics (``.values[0]`` per antibody name, bin/concatenate.py:212-220)
stays deterministic under distribution: duplicates resolve to the row
with the smallest file position, not to an arbitrary ``first()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.functions.antibodies import (
    standardized_antibody_name,
)
from codex_data_products_spark.sources.positional_text import (
    read_lines_with_positions,
)

COLUMNS = ["antibody_name", "uniprot_accession_number", "rr_id", "channel_id"]


def read_antibodies(spark: SparkSession, path: str) -> DataFrame:
    """(pos, antibody_name, uniprot_accession_number, rr_id, channel_id)
    with ``antibody_name`` fully standardized (strip + synonym map,
    standardize_antb_df bin/concatenate.py:186-192)."""
    lines = read_lines_with_positions(spark, path)
    fields = lines.select(
        "pos", F.split("line", "\t").alias("f"), F.col("line")
    )
    header = fields.filter(F.col("pos") == 1).select(F.col("f")).first()
    if header is None:
        raise ValueError(f"empty antibodies tsv: {path}")
    name_to_idx = {name.strip(): i + 1 for i, name in enumerate(header[0])}
    missing = [c for c in COLUMNS if c not in name_to_idx]
    if missing:
        raise ValueError(f"antibodies tsv {path} missing columns {missing}")
    body = fields.filter(F.col("pos") > 1)
    return body.select(
        "pos",
        standardized_antibody_name(
            F.element_at("f", name_to_idx["antibody_name"])
        ).alias("antibody_name"),
        *[
            F.element_at("f", name_to_idx[c]).alias(c)
            for c in COLUMNS
            if c != "antibody_name"
        ],
    )


def first_match_per_antibody(antibodies: DataFrame) -> DataFrame:
    """A5: collapse duplicate names to the first file occurrence."""
    return antibodies.groupBy("antibody_name").agg(
        F.min_by("uniprot_accession_number", "pos").alias(
            "uniprot_accession_number"
        ),
        F.min_by("rr_id", "pos").alias("rr_id"),
        F.min_by("channel_id", "pos").alias("channel_id"),
    )
