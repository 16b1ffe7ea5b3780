"""Pivot / unpivot — SURVEY.md §2.6 (P1-P3).

P1 is the reference's channel×dataset annotation pivot
(bin/concatenate.py:195-221); P2 its donor-concept pivot
(make_uuids_tsv.py:105-156); P3 the wide↔long matrix reshape. Spark's
``pivot`` with an *explicit* value list avoids the extra distinct-values
job and keeps the plan static — essential at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# ---------------------------------------------------------------------------
# pivot_event_values — P1/P2: long→wide with one column per category and a
# first/sum aggregate per cell. DuckDB oracle uses conditional aggregation
# so the output column names match exactly.
# ---------------------------------------------------------------------------

_PIVOT_CELLS = ",\n  ".join(
    "CAST(round(sum(CASE WHEN event_type = '{t}' "
    "THEN CAST(value AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS {t}".format(t=t)
    for t in EVENT_TYPES
)

_PIVOT_SQL = f"""
SELECT
  user_id,
  {_PIVOT_CELLS}
FROM events
GROUP BY user_id
"""


@register("pivot_event_values", sql=_PIVOT_SQL)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = T(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
        )
    )


# ---------------------------------------------------------------------------
# unpivot_part — P3: wide→long melt (the reference consumes wide CSV/HDF5
# matrices and the engine's internal form is long, SURVEY §1.1). Narrow
# zero-shuffle Expand in Spark.
# ---------------------------------------------------------------------------

_UNPIVOT_SQL = """
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
UNION ALL
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
"""


@register("unpivot_part", sql=_UNPIVOT_SQL)
def unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = T(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# pivot_roundtrip — P1↔P3 round-trip: pivot the long form to wide and melt
# back; proves the tidy-long internal representation is lossless
# (SURVEY §7 "keep the tidy long form as the internal representation").
# ---------------------------------------------------------------------------

_ROUNDTRIP_SQL = """
WITH wide AS (
  SELECT
    user_id,
    CAST(round(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS click,
    CAST(round(sum(CASE WHEN event_type = 'view'  THEN CAST(value AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS view
  FROM events
  GROUP BY user_id
)
SELECT user_id, 'click' AS event_type, click AS total_value FROM wide WHERE click IS NOT NULL
UNION ALL
SELECT user_id, 'view' AS event_type, view AS total_value FROM wide WHERE view IS NOT NULL
"""


@register("pivot_roundtrip", sql=_ROUNDTRIP_SQL)
def pivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = T(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view"])
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2).cast("double")
        )
    )
    return (
        wide.unpivot(
            ids=["user_id"],
            values=["click", "view"],
            variableColumnName="event_type",
            valueColumnName="total_value",
        )
        .filter(F.col("total_value").isNotNull())
    )
