"""Cross-engine verification: run a registered query on Spark AND its
ANSI-SQL oracle on DuckDB over the same parquet tables, and compare
exactly (columns sorted by name, rows sorted by value, floats by repr).

This ships as part of the engine — ``cli.py verify`` — so a user
switching from the reference can audit every query against an
independent engine on their own data directory. ``tests/oracle_utils``
re-exports these for the test suite; the external driver runs the same
comparison shape to produce CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from codex_data_products_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Execute oracle SQL on DuckDB with every table registered as a
    view over ``{sf_dir}/{table}.parquet``."""
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


def compare_frames(
    spark_df: pd.DataFrame, oracle_df: pd.DataFrame
) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} "
            f"oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(
            f"row counts differ: spark={len(spark_df)} oracle={len(oracle_df)}"
        )
    s_rows = canonical_rows(spark_df)
    o_rows = canonical_rows(oracle_df)
    if s_rows != o_rows:
        o_set = set(o_rows)
        s_set = set(s_rows)
        only_spark = [r for r in s_rows if r not in o_set][:3]
        only_oracle = [r for r in o_rows if r not in s_set][:3]
        problems.append(
            f"values differ; sample spark-only={only_spark} "
            f"oracle-only={only_oracle}"
        )
    return problems


def verify_queries(
    spark, sf_dir: str, names: list[str] | None = None, progress: bool = False
) -> dict[str, list[str]]:
    """Run each registered query and its oracle; map name → problems
    (empty list = match; queries without an oracle are skipped).
    ``progress`` streams one line per query as it finishes, so a long
    sweep that dies mid-run still attributes the failure."""
    from codex_data_products_spark import registry

    registry.load_all()
    targets = names or sorted(registry.ORACLES)
    results: dict[str, list[str]] = {}
    for name in targets:
        if name not in registry.ORACLES:
            continue
        # a query that errors (e.g. a result set too large for the
        # driver-side comparison at an extreme stress SF) must record
        # its own failure, not abort the remaining sweep
        try:
            spark_df = registry.QUERIES[name](spark, sf_dir).toPandas()
            oracle_df = run_oracle(registry.ORACLES[name], sf_dir)
            results[name] = compare_frames(spark_df, oracle_df)
        except Exception as exc:  # noqa: BLE001
            first = str(exc).splitlines()[0][:200] if str(exc) else repr(exc)
            results[name] = [f"error: {first}"]
        if progress:
            status = "MATCH" if not results[name] else "MISMATCH"
            print(f"{status:8s} {name}", flush=True)
    return results
