"""Declared schemas for every CODEX table (SURVEY.md §1.2, FIXTURES.md).

The reference infers everything at runtime (``dtype=str`` reads,
``applymap(str)`` coercions — bin/concatenate.py:347,249,409); this engine
declares fixed StructTypes so scans never pay inference and Catalyst can
prune/pushdown against known columns.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


# Catalog TSV (FIXTURES.md §1; written make_uuids_tsv.py:169-182, read
# bin/concatenate.py:347). The leading pandas-index column is modeled
# explicitly as row_id and dropped at ingest (bin/concatenate.py:303).
CATALOG = _st(
    ("row_id", StringType()),
    ("uuid", StringType()),
    ("hubmap_id", StringType()),
    ("immediate_ancestor_ids", StringType()),
    ("immediate_descendant_ids", StringType()),
    ("age", StringType()),
    ("sex", StringType()),
    ("height", StringType()),
    ("weight", StringType()),
    ("bmi", StringType()),
    ("cause_of_death", StringType()),
    ("race", StringType()),
)

# Antibodies TSV (FIXTURES.md §2; read bin/concatenate.py:249).
ANTIBODIES = _st(
    ("antibody_name", StringType()),
    ("uniprot_accession_number", StringType()),
    ("rr_id", StringType()),
    ("channel_id", StringType()),
)

# Cell centers CSV (FIXTURES.md §4; read bin/concatenate.py:281-286).
CENTERS = _st(
    ("ID", StringType()),
    ("x", DoubleType()),
    ("y", DoubleType()),
)

# MatrixMarket adjacency edge list after parse (FIXTURES.md §6): 1-based
# positions into the labels file.
MM_EDGES = _st(
    ("i", LongType()),
    ("j", LongType()),
    ("weight", DoubleType()),
)

# Labels file after positional read (FIXTURES.md §7).
LABELS = _st(
    ("pos", LongType()),  # 1-based line position = matrix index
    ("cell_id", StringType()),
)

# Long-format expression matrix — the engine's internal representation of
# AnnData X + layers (SURVEY §1.1): one row per (cell, channel).
X_LONG = _st(
    ("dataset", StringType()),
    ("cell_id", StringType()),  # global id: "<dataset>-<original_obs_id>"
    ("channel", StringType()),
    ("total", DoubleType()),
    ("mean", DoubleType()),
)

# Cell (obs) metadata (bin/concatenate.py:268-275 + donor join :300-307).
OBS = _st(
    ("cell_id", StringType()),
    ("dataset", StringType()),
    ("tissue", StringType()),
    ("x", DoubleType()),
    ("y", DoubleType()),
)

# Channel (var) metadata keyed by normalized channel name.
VAR = _st(("channel", StringType()),)

# Tidy long form of the varm annotation matrices (SURVEY §2.6 P1): one row
# per (channel, dataset, kind) instead of one column per dataset.
VARM_LONG = _st(
    ("channel", StringType()),
    ("dataset", StringType()),
    ("uniprot", StringType()),
    ("rrid", StringType()),
    ("antibodies_tsv_id", StringType()),
)

# Cell-cell adjacency on global string keys (SURVEY §2.7 U3).
EDGES = _st(
    ("src_cell_id", StringType()),
    ("dst_cell_id", StringType()),
    ("weight", DoubleType()),
)

# Organ lookup (FIXTURES.md §8).
ORGAN_TYPES = _st(
    ("code", StringType()),
    ("description", StringType()),
)

# Wide per-dataset expression CSV has a dynamic channel set; its fixed
# prefix is the ID column (header supplies the rest,
# bin/concatenate.py:180-184).
EXPRESSION_ID_COL = "ID"
