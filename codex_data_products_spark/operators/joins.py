"""Join strategy utilities for cluster-scale layouts.

Two techniques SCALE.md leans on, packaged as reusable operators:

  * **bucketed co-located joins** — write both fact tables bucketed by
    the join key; Spark then plans the equi-join with zero Exchange on
    either side (verified by ``tests/test_bucketing.py``). At 100 TB
    this converts the recurring fact⋈fact join from the dominant
    shuffle into a local zip of pre-sorted buckets.
  * **salted joins** — when one side's key distribution is heavily
    skewed and AQE's skew splitting isn't available (e.g. a broadcast
    is too big but one key holds 20% of rows), explode the small side
    into ``n_salts`` copies and scatter the big side uniformly; the
    hot key spreads over ``n_salts`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and
    optionally sorted) by ``key`` — the write-side half of a
    shuffle-free join."""
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name, format="parquet")


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts the plan contains no Exchange (and with sorted buckets
    no Sort either)."""
    return spark.table(left_table).join(spark.table(right_table), key)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: scatter ``big`` across ``n_salts``
    sub-keys, replicate ``small`` to all of them.

    Output equals ``big.join(small, key, how)`` for inner/left joins
    (each big row meets exactly one copy of each matching small row).
    Cost: ``small`` is materialized ``n_salts`` times — use for
    dim-scale right sides with hot keys on the left.
    """
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
