"""Query registry: the single source of truth for the driver contract.

Each implemented operator/query from SURVEY.md §2 registers

  * a Spark callable ``(spark, sf_dir) -> DataFrame``, and
  * (when SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB.

``__spark_entry__.py`` re-exports these. Column names are aliased
identically on both sides — the driver's comparator sorts columns by name
before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registrations run."""
    from codex_data_products_spark.queries import (  # noqa: F401
        advanced,
        aggregates,
        ann,
        dedup,
        events,
        graph,
        joins,
        linkage,
        multimodal,
        quality,
        relational,
        reshape,
        sampling,
        setops,
        similarity,
        text,
        tpch_extra,
        windows,
    )
