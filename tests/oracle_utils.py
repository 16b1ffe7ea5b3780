"""Local mirror of the driver's DuckDB-oracle comparison.

Stricter than the driver: values are compared exactly (after sorting
columns by name and rows by value), so any cross-engine nondeterminism
fails here before it fails in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from codex_data_products_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return repr(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} "
            f"oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row counts differ: spark={len(spark_df)} oracle={len(oracle_df)}")
    s_rows = canonical_rows(spark_df)
    o_rows = canonical_rows(oracle_df)
    if s_rows != o_rows:
        only_spark = [r for r in s_rows if r not in set(o_rows)][:3]
        only_oracle = [r for r in o_rows if r not in set(s_rows)][:3]
        problems.append(
            f"values differ; sample spark-only={only_spark} oracle-only={only_oracle}"
        )
    return problems
