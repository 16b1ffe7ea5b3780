"""MatrixMarket COO reader — SURVEY.md §2.1 S5.

The reference calls ``scipy.io.mmread`` (bin/concatenate.py:313), a
single-threaded full materialization. Here each .mtx becomes (i, j,
weight) rows: comment lines (``%``) are dropped, the first remaining
line per file is the size line (rows cols nnz) and is excluded, the
rest are 1-based coordinate triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codex_data_products_spark.sources.positional_text import (
    read_lines_with_positions,
)


def read_matrix_market(
    spark: SparkSession, path: str, with_source_file: bool = False
) -> DataFrame:
    """Read one or many .mtx files into (i, j, weight) edge rows.

    ``path`` may be a glob; with ``with_source_file`` each row also
    carries ``source_file`` so per-dataset matrices stay separable
    (replaces the reference's per-file loop, bin/concatenate.py:378-394).
    """
    lines = read_lines_with_positions(spark, path)
    # Drop comments AND blank lines before picking the size line, so an
    # .mtx with leading/interior blank lines parses identically to the
    # registered format("matrixmarket") DataSource (ADVICE r4 parity).
    data = lines.filter(
        (~F.col("line").startswith("%")) & (F.trim("line") != "")
    )
    # The size line is the first non-comment line of each file.
    w = Window.partitionBy("source_file").orderBy("pos")
    body = (
        data.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("source_file", F.split("line", r"\s+").alias("f"))
    )
    out = body.select(
        "source_file",
        F.element_at("f", 1).cast("long").alias("i"),
        F.element_at("f", 2).cast("long").alias("j"),
        # pattern matrices have no weight column: try_element_at (not
        # element_at, which throws under ANSI mode) → default 1.0
        F.coalesce(
            F.try_element_at("f", F.lit(3)).cast("double"), F.lit(1.0)
        ).alias("weight"),
    )
    return out if with_source_file else out.drop("source_file")
