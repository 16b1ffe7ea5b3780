"""Data-layout management for parquet products: clustered writes and
small-file compaction.

The reference writes one monolithic HDF5 artifact per run
(bin/concatenate.py:454-456) — layout management doesn't exist there.
At 100 TB the layout IS the query plan: a table range-clustered on its
dominant filter column lets every engine (Spark, DuckDB, Trino) skip
whole files on the parquet footer min/max stats, and keeping file sizes
near the scan split size stops both the small-file metadata storm and
the giant-file straggler task.

Both operations are expressed as plain DataFrame writes so they run
distributed:

* ``cluster_write`` — ``repartitionByRange(n, cols)`` gives disjoint
  per-file key ranges (sampled range boundaries → near-equal file
  sizes even on skewed keys), and ``sortWithinPartitions`` tightens
  per-rowgroup min/max so page-level skipping works too.
* ``compact`` — bin-packs existing fragments back to ``target_files``
  outputs. ``coalesce`` (no shuffle) when shrinking; hash
  ``repartition`` only when growing.

Neither changes row content — tests assert bytes-identical datasets —
so they compose with any downstream query unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int,
) -> None:
    """Write ``df`` as ``num_files`` parquet files range-clustered on
    ``cluster_cols``: disjoint per-file key ranges, sorted inside each
    file for rowgroup/page-level stats pruning."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_files: int,
) -> None:
    """Rewrite a fragmented parquet dataset into ``target_files``
    files. Shrinking uses ``coalesce`` — a shuffle-free merge of
    existing fragments; growing falls back to a hash repartition."""
    df = spark.read.parquet(src_path)
    n_current = df.rdd.getNumPartitions()
    if target_files <= n_current:
        out = df.coalesce(target_files)
    else:
        out = df.repartition(target_files)
    out.write.mode("overwrite").parquet(dst_path)


def file_stats(spark: SparkSession, path: str, col: str) -> list[dict]:
    """Per-file row count and min/max of ``col`` — the footer stats a
    scan planner uses for file skipping. Computed distributed via
    input_file_name, not by reading footers on the driver."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    rows = (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(col).alias("min_val"),
            F.max(col).alias("max_val"),
        )
        .collect()
    )
    return [r.asDict() for r in rows]


def bucketed_write(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a hash-bucketed (and per-bucket sorted) table.

    This is the fact-fact join layout for cluster scale: two tables
    bucketed on their join key with the same bucket count are already
    co-partitioned on disk, so an equi-join on that key needs NO
    Exchange on either side — the shuffle that dominates a 100 TB
    fact-fact join is paid once at write time and amortized over every
    subsequent join/aggregation on the key (the bucketed twin of what
    ``cluster_write`` does for range filters). Requires a catalog
    entry (bucket metadata lives in the table definition, not the
    parquet footers), hence ``saveAsTable``; pass ``path`` to keep the
    data external to the warehouse.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def zorder_key(x_col: str, y_col: str, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` of two
    non-negative integer columns. Range-clustering on this key gives
    file-level locality on BOTH dimensions at once — the multi-column
    layout trick single-column range clustering can't provide (its
    second column has no locality). Pure integer bit expressions,
    JVM-side, no UDF."""
    from pyspark.sql import functions as F

    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
        f"acc + (CAST((({x_col} >> i) & 1) AS BIGINT) << (2 * i))"
        f"    + (CAST((({y_col} >> i) & 1) AS BIGINT) << (2 * i + 1)))"
    )


def partitioned_write(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style directory partitioning — the write-time layout for
    IVF-cell-pruned similarity search (SCALE.md): the corpus is written
    ``partitionBy(cell)`` so a probe that touches nprobe cells compiles
    to a scan whose ``PartitionFilters`` eliminate every other cell's
    files at PLANNING time, before any I/O. Directory partitioning
    (not range clustering) is the right tool here because probes are
    exact-match on a low-cardinality cell id, and it is what
    ``test_plans.py::test_ivf_probe_is_partition_pruned`` plan-guards."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
