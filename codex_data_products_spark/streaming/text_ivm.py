"""Incrementally-maintained vocabulary induction — the text family's
IVM: the maintained view equals ``vocab_top_terms`` (queries/text.py)
recomputed from scratch over every document ingested so far.

Both folds are additive under the append-only corpus contract (fresh
doc_ids per batch — the same contract the substring maintainer's
insert path uses): term frequency sums, and document frequency sums
because each batch's distinct (term, doc) pairs are disjoint from
every earlier batch's. So the state is two append-logs of per-batch
partial aggregates:

  tf_delta/batch=<k>   (lang, term, tf)  — the batch's term counts
  df_delta/batch=<k>   (term, df)        — the batch's per-term
                                           distinct-doc counts

Every write is O(|delta vocabulary|); the corpus text is never
re-read. The snapshot folds the logs with term-grain aggregates —
vocabulary-sized, not corpus-sized — and ranks; compaction
consolidates the history into one summed floor per log (the
``compact=`` protocol shared with every maintainer here). The top-V
rank itself stays a read-time operation: maintaining a materialized
top-V under inserts would need the full histogram anyway (an item can
enter the top from arbitrarily far below), and the histogram IS the
maintained state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codex_data_products_spark.streaming.dedup_ivm import (
    _gc_log_dirs,
    _log_union,
)

_TF_SCHEMA = "lang string, term string, tf long"
_DF_SCHEMA = "term string, df long"


def _tok(docs: DataFrame) -> DataFrame:
    from codex_data_products_spark.queries.dedup import _tokens

    return docs.select(
        "doc_id", "lang", F.explode(_tokens()).alias("term")
    ).filter(F.length("term") > 3)


def apply_vocab_batch(
    batch_docs: DataFrame, state_dir: str, batch_id: int
) -> None:
    """Fold one batch of NEW documents (fresh doc_ids) into the
    vocabulary state: two delta-vocabulary-sized appends, replay-safe
    (a crashed batch overwrites its own dirs)."""
    tok = _tok(batch_docs).persist()
    (
        tok.groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .write.mode("overwrite")
        .parquet(f"{state_dir}/tf_delta/batch={batch_id}")
    )
    (
        tok.groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .write.mode("overwrite")
        .parquet(f"{state_dir}/df_delta/batch={batch_id}")
    )
    tok.unpersist()


def vocab_snapshot(
    spark: SparkSession,
    state_dir: str,
    top: int = 5,
    version: int | None = None,
) -> DataFrame:
    """(lang, term, tf, df, rank) — the maintained top-``top`` per
    language, equal to the from-scratch ``vocab_top_terms`` over all
    ingested batches. Vocabulary-grain aggregates only."""
    tf = (
        _log_union(spark, f"{state_dir}/tf_delta", _TF_SCHEMA, version)
        .groupBy("lang", "term")
        .agg(F.sum("tf").cast("long").alias("tf"))
    )
    df = (
        _log_union(spark, f"{state_dir}/df_delta", _DF_SCHEMA, version)
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term")
    )
    return (
        tf.join(df, "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top)
        .select("lang", "term", "tf", "df", "rank")
    )


def compact_vocab_state(
    spark: SparkSession, state_dir: str, upto: int, gc: bool = True
) -> None:
    """Consolidate both logs through batch ``upto`` into summed
    ``compact=<upto>`` floors (``_SUCCESS``-gated, superseded dirs
    GC'd — the shared protocol)."""
    for root, schema, keys in (
        (f"{state_dir}/tf_delta", _TF_SCHEMA, ["lang", "term"]),
        (f"{state_dir}/df_delta", _DF_SCHEMA, ["term"]),
    ):
        col = schema.split(",")[-1].strip().split()[0]
        snap = (
            _log_union(spark, root, schema, upto)
            .groupBy(*keys)
            .agg(F.sum(col).cast("long").alias(col))
            .localCheckpoint()
        )
        snap.write.mode("overwrite").parquet(f"{root}/compact={upto}")
        if gc:
            _gc_log_dirs(spark, (root,), upto)


def run_vocab_maintenance(
    docs: DataFrame, state_dir: str, checkpoint_dir: str
) -> None:
    """availableNow foreachBatch drain onto the maintained vocabulary
    (standard replay contract)."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        apply_vocab_batch(batch, state_dir, batch_id)

    (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
