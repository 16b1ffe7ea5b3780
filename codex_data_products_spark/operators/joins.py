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

from dataclasses import dataclass

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Generic as-of join: for every left row, the most recent right row
    with ``right_ts < left_ts`` (``<=`` when ``strict=False``) sharing
    the ``on`` key.

    Implemented with the union + last(ignorenulls) window pattern — one
    shuffle on the key, cost O((|L|+|R|) log) per key partition, no
    range-join row explosion. The library face of the registered
    ``asof_join`` query (queries/windows.py).
    """
    from pyspark.sql import Window

    right_value_cols = right_value_cols or []
    l_cols = [c for c in left.columns]

    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_t"),
        F.struct(
            F.col(right_ts).alias("_asof_ts"),
            *[F.col(c) for c in right_value_cols],
        ).alias("_rv"),
        F.lit(True).alias("_is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != on],
    )
    lhs = left.select(
        F.col(on),
        F.col(left_ts).alias("_t"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.lit(False).alias("_is_right"),
        *[F.col(c) for c in l_cols if c != on],
    )
    unioned = lhs.unionByName(r)
    # at identical timestamps: strict ⇒ the right row must NOT be
    # visible to the co-timed left row ⇒ order right rows after left
    # ones (desc on _is_right=False first); non-strict ⇒ before
    order = [F.col("_t"), F.col("_is_right").asc() if strict else F.col("_is_right").desc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = unioned.withColumn(
        "_last_rv", F.last("_rv", ignorenulls=True).over(w)
    )
    out = carried.filter(~F.col("_is_right")).select(
        on,
        *[c for c in l_cols if c != on],
        F.col("_last_rv._asof_ts").alias("asof_ts"),
        *[F.col(f"_last_rv.{c}").alias(f"asof_{c}") for c in right_value_cols],
    )
    return out


def merge_into(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    change_key: str,
    op_col: str = "op",
    set_cols: dict[str, str] | None = None,
    insert_defaults: dict[str, Column] | None = None,
    action_col: str | None = None,
) -> DataFrame:
    """MERGE semantics (upsert + delete) as one full-outer join — the
    batch CDC-apply primitive the reference cannot express (its pandas
    concat only appends; bin/concatenate.py:393-400).

    ``changes`` rows carry ``op_col`` in {'U','I','D'}: matched 'U'
    rows have ``set_cols`` (base col -> changes col) applied, matched
    'D' rows are dropped, unmatched 'I' rows are inserted with
    ``insert_defaults`` filling base columns absent from ``set_cols``.
    Unmatched base rows pass through. At 100 TB both sides
    hash-partition on the key (one shuffle each); with a bucketed base
    table the join is shuffle-free on the base side, which is the
    layout `plans.layout.cluster_write` produces.
    """
    set_cols = set_cols or {}
    insert_defaults = insert_defaults or {}
    joined = base.join(
        changes, base[key] == changes[change_key], "full_outer"
    )
    matched = base[key].isNotNull()
    # 'D' drops the matched base row; an unmatched 'D' is a no-op (the
    # full-outer row has no base side to keep, so it drops entirely)
    out = joined.filter(
        ~F.coalesce(F.col(op_col) == "D", F.lit(False))
    )
    cols = []
    for c in base.columns:
        if c == key:
            col = F.coalesce(base[key], changes[change_key]).alias(c)
        elif c in set_cols:
            upd = (F.col(op_col).isin("U", "I")) & F.col(
                set_cols[c]
            ).isNotNull()
            # NULL change value: keep the base value when matched, else
            # fall back to the insert default (a NULL change must never
            # insert a NULL over a declared default)
            fallback = (
                F.when(matched, base[c]).otherwise(insert_defaults[c])
                if c in insert_defaults
                else base[c]
            )
            col = F.when(upd, F.col(set_cols[c])).otherwise(fallback).alias(c)
        elif c in insert_defaults:
            col = F.when(matched, base[c]).otherwise(
                insert_defaults[c]
            ).alias(c)
        else:
            col = base[c]
        cols.append(col)
    if action_col:
        cols.append(
            F.when(F.col(op_col).isNull(), "kept")
            .when(F.col(op_col) == "U", "updated")
            .otherwise("inserted")
            .alias(action_col)
        )
    return out.select(*cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of a keyed table: one full-outer join emitting
    (key, diff_action ∈ added|removed|changed, per-column old/new) —
    the dataset regression test every pipeline migration runs (and the
    inverse of ``merge_into``: diff(old, merge_into(old, ch)) recovers
    the effective change feed). Unchanged rows are dropped as early as
    possible so at 100 TB the output is change-sized, not table-sized;
    with both snapshots clustered on the key the join is co-located."""
    compare_cols = compare_cols or [c for c in old.columns if c != key]
    o = old.select(key, *compare_cols).alias("o")
    n = new.select(key, *compare_cols).alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    o_key, n_key = F.col(f"o.{key}"), F.col(f"n.{key}")
    same = F.lit(True)
    for c in compare_cols:
        same = same & (F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")))
    action = (
        F.when(o_key.isNull(), "added")
        .when(n_key.isNull(), "removed")
        .when(~same, "changed")
    )
    out_cols = [
        F.coalesce(o_key, n_key).alias(key),
        action.alias("diff_action"),
    ]
    for c in compare_cols:
        out_cols.append(F.col(f"o.{c}").alias(f"old_{c}"))
        out_cols.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return joined.filter(action.isNotNull()).select(*out_cols)


# --- cost-based strategy selection -----------------------------------------


@dataclass(frozen=True)
class JoinEstimate:
    """Histogram-product join statistics (queries/advanced.py
    join_cardinality is the registered, oracle-checked face of the
    same estimator). All fields derive from key-cardinality-sized
    count tables — never from executing the join itself."""

    left_rows: int
    right_rows: int
    n_keys_matched: int
    predicted_rows: int
    max_key_product: int
    # hottest single key's row count on the LEFT (big) side — what a
    # skew_profile audit of the join key reports as max_rows; sizes the
    # salt fan-out (0 = unknown, fall back to the fixed default)
    max_left_key_rows: int = 0

    @property
    def avg_key_product(self) -> float:
        return self.predicted_rows / max(self.n_keys_matched, 1)


def estimate_join(left: DataFrame, right: DataFrame, key: str) -> JoinEstimate:
    """Compute the estimate with two grouped counts + one count-table
    join (each job is key-cardinality-sized). At 100 TB you run this on
    a hash-sample of keys or read it from ANALYZE TABLE statistics; the
    algebra is identical."""
    a = left.groupBy(F.col(key).alias("_k")).agg(
        F.count(F.lit(1)).alias("_na")
    )
    b = right.groupBy(F.col(key).alias("_k")).agg(
        F.count(F.lit(1)).alias("_nb")
    )
    stats = (
        a.join(b, "_k")
        .select(
            (F.col("_na") * F.col("_nb")).alias("_p"),
            F.col("_na"),
        )
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.coalesce(F.sum("_p"), F.lit(0)).alias("pr"),
            F.coalesce(F.max("_p"), F.lit(0)).alias("mx"),
            # Left count of the key with the LARGEST JOIN PRODUCT, not
            # the global max(_na): the hot joined key (the one salting
            # must spread) can differ from the widest left key when the
            # latter matches a tiny right side.
            F.coalesce(F.max_by("_na", "_p"), F.lit(0)).alias("mxa"),
        )
        .first()
    )
    return JoinEstimate(
        left_rows=left.count(),
        right_rows=right.count(),
        n_keys_matched=int(stats["m"]),
        predicted_rows=int(stats["pr"]),
        max_key_product=int(stats["mx"]),
        max_left_key_rows=int(stats["mxa"]),
    )


def estimate_from_stats(left: dict, right: dict, key: str) -> JoinEstimate:
    """Build the ``JoinEstimate`` from PERSISTED table statistics alone
    — the dicts a committed product's marker carries per table
    (``plans.codex_pipeline.product_table_stats``: ``{"rows": N,
    "columns": {col: {"ndv": n, "max_rows": m}}}``). Zero Spark jobs: a
    freshly-opened product can feed ``plan_join`` straight from its
    commit metadata, the way a warehouse CBO plans from catalog stats
    instead of scanning (ANALYZE TABLE's sizeInBytes/rowCount, persisted
    at write time instead of on demand).

    Estimation under the standard uniformity assumption:
    ``predicted_rows = |L|·|R| / max(ndv)`` (each side's keys spread
    evenly over its ndv, containment of the smaller key set);
    ``max_key_product`` upper-bounds the hot joined key by pairing each
    side's hottest key.
    """
    lc = left["columns"][key]
    rc = right["columns"][key]
    lr, rr = int(left["rows"]), int(right["rows"])
    denom = max(int(lc["ndv"]), int(rc["ndv"]), 1)
    return JoinEstimate(
        left_rows=lr,
        right_rows=rr,
        n_keys_matched=min(int(lc["ndv"]), int(rc["ndv"])),
        predicted_rows=lr * rr // denom,
        max_key_product=int(lc["max_rows"]) * int(rc["max_rows"]),
        max_left_key_rows=int(lc["max_rows"]),
    )


def auto_salts(
    max_left_key_rows: int,
    target_rows_per_task: int = 1_000_000,
    lo: int = 2,
    hi: int = 64,
) -> int:
    """Size the salt fan-out from the hot key's row count (the
    skew_profile ``max_rows`` statistic): just enough sub-keys that no
    reducer owns more than ``target_rows_per_task`` rows of the hot
    key, clamped to [lo, hi]. Over-salting costs ``n_salts`` copies of
    the small side, so the fan-out should track the skew, not a fixed
    constant."""
    need = -(-max(max_left_key_rows, 1) // target_rows_per_task)  # ceil
    return max(lo, min(hi, need))


def plan_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    est: JoinEstimate,
    how: str = "inner",
    broadcast_row_limit: int = 1_000_000,
    skew_factor: float = 8.0,
    n_salts: int | None = None,
) -> tuple[DataFrame, str]:
    """Pick the physical join strategy FROM THE ESTIMATE ALONE (no data
    is touched here) and return ``(joined, strategy)``.

    Decision ladder, mirroring what a cost-based optimizer does with
    the same histogram product:

      1. ``right_rows <= broadcast_row_limit`` → **broadcast** hash
         join: the dim side ships to every executor, zero shuffle of
         the fact side.
      2. hot key (``max_key_product > skew_factor × avg_key_product``)
         → **salted** scatter: the big side sprays across ``n_salts``
         sub-keys so no single reducer owns the hot key. Requires the
         right side to be replicable (dim-scale but over the broadcast
         limit) — the same precondition as ``salted_join``. When
         ``n_salts`` is None the fan-out is SIZED FROM THE ESTIMATE
         too (``auto_salts`` over the hot key's left-side row count —
         the skew_profile ``max_rows`` statistic), so a 10× hotter key
         gets ~10× the sub-keys instead of a fixed 16.
      3. otherwise → plain **shuffle** join; AQE re-plans at runtime
         if actual sizes disagree with the estimate.
    """
    if est.right_rows <= broadcast_row_limit:
        return left.join(F.broadcast(right), key, how), "broadcast"
    if (
        est.n_keys_matched > 0
        and est.max_key_product > skew_factor * est.avg_key_product
    ):
        if n_salts is None:
            n_salts = (
                auto_salts(est.max_left_key_rows)
                if est.max_left_key_rows
                else 16
            )
        return salted_join(left, right, key, n_salts=n_salts, how=how), "salted"
    return left.join(right, key, how), "shuffle"


# ---------------------------------------------------------------------------
# Selectivity-driven filter planning: close the statistics loop the
# way estimate_join -> plan_join closed the join one. A width-W bucket
# histogram (the artifact queries/advanced.stats_equidepth_histogram
# builds and streaming/merge.run_histogram_maintenance keeps fresh)
# estimates how many rows a range predicate keeps; the plan decision
# — broadcast the filtered side or leave it on the shuffle path — is
# then made FROM THE ESTIMATE ALONE, before the filter ever runs.
# ---------------------------------------------------------------------------


def estimate_range_rows(
    hist: list[tuple[int, int]], lo: float, hi: float, width: int = 1000
) -> float:
    """Estimated rows with value in [lo, hi] from a [(bucket, count)]
    width-W histogram, uniform-within-bucket — the textbook CBO
    formula. The histogram is bucket-grain (bounded), so this is
    driver-side arithmetic over a tiny list, exactly like a real
    optimizer reading column stats."""
    est = 0.0
    for bucket, count in hist:
        b_lo, b_hi = bucket * width, (bucket + 1) * width
        frac_hi = min(max((hi - b_lo) / (b_hi - b_lo), 0.0), 1.0)
        frac_lo = min(max((lo - b_lo) / (b_hi - b_lo), 0.0), 1.0)
        est += count * (frac_hi - frac_lo)
    return est


def plan_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    filter_col: str,
    lo: float,
    hi: float,
    hist: list[tuple[int, int]],
    how: str = "inner",
    broadcast_row_limit: int = 1_000_000,
    width: int = 1000,
) -> tuple[DataFrame, str, float]:
    """Join ``fact`` to ``dim`` filtered to ``filter_col`` in
    [lo, hi], choosing broadcast-vs-shuffle from the HISTOGRAM
    estimate of the filtered dim size (no count job, no data touched):
    a dim that is too big to broadcast unfiltered often collapses to
    broadcastable size after a selective filter — the case a static
    row-count rule misses and AQE only catches after a shuffle stage
    has already been planned. Returns (joined, strategy, est_rows)."""
    filtered = dim.filter(
        (F.col(filter_col) >= lo) & (F.col(filter_col) <= hi)
    )
    # No statistics means UNKNOWN, not zero: a real CBO never treats a
    # missing histogram as "estimated tiny" — doing so would broadcast an
    # arbitrarily large filtered dim and OOM the executors. Fall back to
    # the safe shuffle path when there are no stats to read.
    if not hist:
        return fact.join(filtered, key, how), "shuffle", float("nan")
    est = estimate_range_rows(hist, lo, hi, width)
    if est <= broadcast_row_limit:
        return fact.join(F.broadcast(filtered), key, how), "broadcast", est
    return fact.join(filtered, key, how), "shuffle", est
