"""Organ-code lookup — SURVEY.md §2.1 S7 / §2.8 E11.

The reference loads ``organ_types.yaml`` per call
(bin/concatenate.py:85,99-103 — convert_tissue_code / get_tissue_type);
here it is loaded once driver-side and exposed as a tiny DataFrame (for
joins) or a dict (for literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from codex_data_products_spark.schemas import ORGAN_TYPES


def load_organ_map(path: str) -> dict[str, str]:
    """code → description from the YAML lookup (FIXTURES.md §8)."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    return {code: entry["description"] for code, entry in data.items()}


def organ_table(spark: SparkSession, path: str) -> DataFrame:
    rows = [(c, d) for c, d in load_organ_map(path).items()]
    return spark.createDataFrame(rows, ORGAN_TYPES)


def convert_tissue_code(path: str, tissue_code: str) -> str:
    """Scalar lookup (bin/concatenate.py:99-103)."""
    return load_organ_map(path)[tissue_code]
