"""Continuously-maintained dimension table: a CDC change stream applied
onto a parquet-materialized base via ``foreachBatch`` + the batch
``merge_into`` operator — the streaming twin of ``merge_upsert``.

Versioned-snapshot storage (``table_dir/v=<batch_id>``): each
micro-batch reads the latest snapshot, merges, and writes the next
version keyed by ``batch_id``, so a foreachBatch retry overwrites the
same version instead of double-applying (idempotent under Spark's
batch-replay contract). Readers pick the max version — the poor-man's
pointer swap every table format (Delta/Iceberg/Hudi) formalizes.

At 100 TB the base side stays partition-pruned and (with a bucketed or
range-clustered layout from ``plans.layout``) shuffle-free in the
merge join; only the micro-batch of changes moves. Snapshot GC =
dropping old ``v=`` dirs past a retention horizon.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codex_data_products_spark.operators.joins import merge_into

_VERSION_RE = re.compile(r"v=(\d+)$")


def table_versions(spark: SparkSession, table_dir: str) -> list[int]:
    """Existing snapshot version numbers, ascending."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(table_dir)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jvm_path):
        return []
    out = []
    for status in fs.listStatus(jvm_path):
        m = _VERSION_RE.search(status.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_table(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Snapshot of the maintained table — latest by default, or any
    retained historical version (time travel: every batch's snapshot
    stays addressable until GC'd)."""
    versions = table_versions(spark, table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(
            f"version {version} not in {versions} under {table_dir}"
        )
    return spark.read.parquet(f"{table_dir}/v={version}")


def bootstrap_table(base: DataFrame, table_dir: str) -> None:
    """Write the initial snapshot (version 0 = before any stream batch)."""
    base.write.mode("overwrite").parquet(f"{table_dir}/v=0")


def run_cdc_apply(
    changes: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key: str,
    change_key: str,
    seq_col: str,
    op_col: str = "op",
    set_cols: dict[str, str] | None = None,
    insert_defaults: dict | None = None,
) -> None:
    """Drain a CDC change stream onto the table with availableNow
    semantics. Within each micro-batch, only the LAST change per key
    (by ``seq_col``, ties broken by the key) is applied — standard CDC
    compaction, same as the batch ``events_latest_per_key`` query —
    because ``merge_into`` joins one change row per key."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        w = Window.partitionBy(change_key).orderBy(
            F.col(seq_col).desc(), F.col(change_key)
        )
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        base = read_table(spark, table_dir)
        merged = merge_into(
            base,
            latest,
            key=key,
            change_key=change_key,
            op_col=op_col,
            set_cols=set_cols,
            insert_defaults=insert_defaults,
        )
        # version = 1 + batch_id: deterministic per batch, so a replay
        # of the same batch overwrites its own snapshot (idempotent)
        merged.write.mode("overwrite").parquet(
            f"{table_dir}/v={batch_id + 1}"
        )

    (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
