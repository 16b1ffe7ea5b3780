"""Windowed event aggregation (batch form of the streaming queries).

The reference has no streaming (SURVEY §2.10); these tumbling-window
aggregates are the batch shape of ``streaming/events.py``'s Structured
Streaming jobs — pytest asserts streaming output equals these results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codex_data_products_spark.functions.compat import dratio
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

_TUMBLING_SQL = """
SELECT
  strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  count(*) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY window_start, event_type
"""


@register("events_tumbling_window", sql=_TUMBLING_SQL)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = T(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SLIDING_SQL = """
WITH offsets AS (
  SELECT unnest([0, 30]) AS off_min
),
slid AS (
  SELECT
    time_bucket(INTERVAL '1 hour', e.ts - to_minutes(o.off_min))
      + to_minutes(o.off_min) AS w_start,
    e.value
  FROM events e CROSS JOIN offsets o
)
SELECT
  strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
  count(*) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
FROM slid
GROUP BY window_start
"""


@register("events_sliding_window", sql=_SLIDING_SQL)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in 2
    windows. Spark's window(slideDuration) does the duplication natively;
    the oracle replicates via an offsets cross join."""
    events = T(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# events_gapfill — dense hourly series per event_type with zero-filled
# empty buckets: the time-series completeness operator (a tumbling agg
# alone silently drops empty windows). The bucket spine is generated
# from the observed min/max — sequence + explode, one cross of
# (event_type × hours) against the sparse aggregate via left join.
# ---------------------------------------------------------------------------

_GAPFILL_SQL = """
WITH bounds AS (
  SELECT
    time_bucket(INTERVAL '1 hour', min(ts)) AS t0,
    time_bucket(INTERVAL '1 hour', max(ts)) AS t1
  FROM events
),
spine AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS h
    FROM bounds
  ) g
),
agg AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
         count(*) AS n
  FROM events GROUP BY h, event_type
)
SELECT
  strftime(s.h, '%Y-%m-%d %H:%M:%S') AS window_start,
  s.event_type,
  coalesce(a.n, 0) AS n_events
FROM spine s LEFT JOIN agg a ON a.h = s.h AND a.event_type = s.event_type
"""


@register("events_gapfill", sql=_GAPFILL_SQL)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = T(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = (
        events.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    agg = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.join(agg, ["h", "event_type"], "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# events_anomaly — z-score outliers per event_type. Mean and variance
# from exact decimal sums (sum x, sum x²) so the statistics — and hence
# the flagged set — are identical across engines; the z computation
# itself is plain double math on those exact inputs.
# ---------------------------------------------------------------------------

_ANOMALY_SQL = """
WITH stats AS (
  SELECT
    event_type,
    count(*) AS n,
    CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
    CAST(sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
         AS DOUBLE) AS s2
  FROM events GROUP BY event_type
),
scored AS (
  SELECT
    e.event_id,
    e.event_type,
    e.value,
    (e.value - s.s1 / s.n)
      / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)) AS z
  FROM events e JOIN stats s ON e.event_type = s.event_type
)
SELECT event_id, event_type, value, round(z, 6) AS zscore
FROM scored
-- threshold the ROUNDED z (the emitted value), matching the Spark
-- side exactly: an unrounded-z filter diverges when a row's z lands
-- inside (2.5, 2.5000005) — round-6 snaps it to the boundary, which
-- one engine would keep and the other drop (caught at sf0.5)
WHERE abs(round(z, 6)) > 2.5
"""


@register("events_anomaly", sql=_ANOMALY_SQL)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = T(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(12,2)")
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    z = (F.col("value") - mean) / F.sqrt(
        F.col("s2") / F.col("n") - mean * mean
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > 2.5)
    )


_ATTRIBUTION_SQL = """
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
FROM events p
JOIN events v
  ON v.user_id = p.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
"""


@register("events_attribution", sql=_ATTRIBUTION_SQL)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase attribution: every view by the same user in the 30
    minutes before a purchase. Batch twin of
    ``streaming/events.attribution_stream`` (stream-stream interval
    join); the lag is exact integer microseconds so both engines (and
    the streaming run) agree bit-for-bit.

    SCALE SHAPE (the scd2 bug-class audit, VERDICT r6 #4): an equi join
    on user_id alone probes EVERY view a user ever made per purchase —
    O(views × purchases) per key, which a bot user turns quadratic
    (~80M probe pairs at sf1.0 for ~0.6M true matches). The fix is the
    ``band_join_buckets`` technique: bucket both sides into 30-minute
    cells and join on (user, cell), with each purchase probing exactly
    its own and the previous cell — any view in [p_ts - 30min, p_ts]
    lands in one of those two, so the residual filter sees only
    time-adjacent candidates. Per-key probe cost drops from
    views-per-lifetime to views-per-hour. Measured at sf1.0 on the
    bot-user generator: see SCALE.md residual-join audit table."""
    events = T(spark, sf_dir, "events")
    cell_us = 1800 * 1_000_000  # 30-minute cells, integer microseconds
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.explode(
            F.array(
                F.expr(f"unix_micros(ts) div {cell_us}"),
                F.expr(f"unix_micros(ts) div {cell_us}") - 1,
            )
        ).alias("cell"),
    )
    v = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.expr(f"unix_micros(ts) div {cell_us}").alias("v_cell"),
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("cell") == F.col("v_cell"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "purchase_id",
            "view_id",
            "user_id",
            (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lag_us"),
        )
    )


_SESSION_WINDOW_SQL = """
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE,
                '%Y-%m-%d %H:%M:%S.%f')          AS window_end,
       count(*) AS n_events
FROM (
  SELECT user_id, ts,
         sum(CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM (
    SELECT user_id, event_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
  )
)
GROUP BY user_id, session_id
"""


@register("events_session_window", sql=_SESSION_WINDOW_SQL)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` operator (30-min gap): Spark merges
    per-key events whose gaps stay under the timeout into one window —
    the built-in equivalent of the gaps-and-islands sessionization in
    ``queries/windows.sessionize`` (which the oracle replicates with
    lag + running sum). The native form is the one that also runs
    incrementally under Structured Streaming with watermark-bounded
    state; ``window.end`` is last event + gap by definition."""
    events = T(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(
                F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("session_start"),
            F.date_format(
                F.col("session_window.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("window_end"),
            "n_events",
        )
    )


_RETENTION_SQL = """
WITH cohorts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
),
joined AS (
  SELECT c.cohort_week,
         CAST(date_diff('day', c.cohort_week, a.active_week) // 7 AS BIGINT)
           AS week_offset,
         a.user_id
  FROM cohorts c JOIN activity a ON a.user_id = c.user_id
),
sizes AS (
  SELECT cohort_week, count(*) AS cohort_size FROM cohorts GROUP BY cohort_week
)
SELECT strftime(j.cohort_week, '%Y-%m-%d') AS cohort_week,
       j.week_offset,
       CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_active,
       CAST(any_value(s.cohort_size) AS BIGINT)  AS cohort_size,
       round(CAST(count(DISTINCT j.user_id) AS DOUBLE)
             / any_value(s.cohort_size), 6)      AS retention
FROM joined j JOIN sizes s ON s.cohort_week = j.cohort_week
GROUP BY j.cohort_week, j.week_offset
"""


@register("events_retention", sql=_RETENTION_SQL)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week;
    each later active week contributes to that cohort's offset bucket.
    Both engines truncate weeks to Monday, and the offset is exact
    integer day-arithmetic (week-truncated stamps differ by multiples
    of 7 days), so no calendar ambiguity. Plan shape: two aggs on
    user_id (one exchange, reused), broadcast of the tiny cohort-size
    dim, final agg on (cohort, offset)."""
    events = T(spark, sf_dir, "events")
    cohorts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    joined = activity.join(cohorts, "user_id").select(
        "user_id",
        "cohort_week",
        (F.datediff("active_week", "cohort_week") / 7)
        .cast("long")
        .alias("week_offset"),
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        joined.join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_active"),
            F.first("cohort_size").cast("long").alias("cohort_size"),
            F.round(
                F.countDistinct("user_id").cast("double") / F.first("cohort_size"),
                6,
            ).alias("retention"),
        )
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            "retention",
        )
    )


_LATEST_SQL = """
SELECT user_id,
       event_id   AS last_event_id,
       event_type AS last_event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
       value      AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""


@register("events_latest_per_key", sql=_LATEST_SQL)
def events_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style compaction: the most recent event per key (rank-1
    window, event_id tie-break). Spark plans WindowGroupLimit — each
    partition keeps one row before the final window, so state is
    O(keys), not O(events). This is the batch shape of streaming
    `dropDuplicates` with a last-write-wins policy."""
    events = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


_FUNNEL_SQL = """
WITH stages AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END)  AS t_signup,
         min(CASE WHEN event_type = 'view' THEN ts END)    AS t_first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_first_purchase
  FROM events GROUP BY user_id
)
SELECT
  count(*) AS n_users,
  CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_signed_up,
  CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_first_view > t_signup
                THEN 1 ELSE 0 END) AS BIGINT)  AS n_viewed_after_signup,
  CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_first_view > t_signup
                AND t_first_purchase > t_first_view
                THEN 1 ELSE 0 END) AS BIGINT)  AS n_full_funnel
FROM stages
"""


@register("events_funnel", sql=_FUNNEL_SQL)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (signup → later first view → later
    first purchase): one conditional-min aggregate per stage, then
    ordering predicates — a single shuffle on user_id, no self-joins.
    NULL stage timestamps (user never reached the stage) fail the >
    comparisons in both engines, so missing stages drop out without
    explicit null guards."""
    events = T(spark, sf_dir, "events")
    stages = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_first_purchase"
        ),
    )
    signed = F.col("t_signup").isNotNull()
    viewed = signed & (F.col("t_first_view") > F.col("t_signup"))
    full = viewed & (F.col("t_first_purchase") > F.col("t_first_view"))
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(signed, 1).otherwise(0)).cast("long").alias("n_signed_up"),
        F.sum(F.when(viewed, 1).otherwise(0))
        .cast("long")
        .alias("n_viewed_after_signup"),
        F.sum(F.when(full, 1).otherwise(0)).cast("long").alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# events_histogram — fixed-bin value histogram per event type. Spark
# uses the built-in width_bucket; the oracle spells out the same
# arithmetic INCLUDING the clamp semantics (DuckDB has no
# width_bucket): v < min → bucket 0, v >= max → bucket n+1. The sf0.1
# data has values past the 500 cap, so the overflow branch is live —
# an unclamped floor formula diverges there (caught by the sf0.1
# oracle sweep). One map-side-combined aggregate — the canonical
# "histogram of a 100 TB column in one pass" shape.
# ---------------------------------------------------------------------------

_HISTOGRAM_SQL = """
SELECT event_type,
       CAST(CASE WHEN value < 0 THEN 0
                 WHEN value >= 500 THEN 26
                 ELSE floor(value / 20.0) + 1 END AS BIGINT) AS bucket,
       count(*)                                AS n_events,
       round(CAST(min(value) AS DOUBLE), 2)    AS lo,
       round(CAST(max(value) AS DOUBLE), 2)    AS hi
FROM events
GROUP BY event_type, bucket
"""


@register("events_histogram", sql=_HISTOGRAM_SQL)
def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    bucket = F.width_bucket(
        F.col("value"), F.lit(0.0), F.lit(500.0), F.lit(25)
    ).cast("long")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# events_ewma — exponential moving average per user, the recursive
# aggregate SQL can't do with plain window frames. SCALE SHAPE
# (VERDICT r4 #1): each EWMA step acc → 0.3·v + 0.7·acc is a LINEAR
# map, and linear maps compose associatively — so instead of one
# unbounded per-user collect_list (a bot user concentrates its whole
# history in one aggregation buffer), the fold is SEGMENTED: per
# (user, day) a bounded within-day fold produces the day's composed
# map as a (scale, offset) pair [s = 0.7^k via repeated multiply,
# o = zero-seeded fold], and the per-user state is then the
# day-ordered list of pairs — O(active days), bounded by the horizon,
# never by event volume. The first event's value seeds the chain
# (list_reduce-without-init semantics, unchanged from the sequential
# version), so the composed map over events 2..n applies as
# m.s·v1 + m.o. BOTH engines run the IDENTICAL segmented arithmetic
# (same op order per event, same pair composition per day), so floats
# stay bit-identical; accumulators are LISTS, not structs — DuckDB's
# list_reduce mutates struct accumulators in place (see
# test_duckdb_list_reduce_struct_acc_aliases_in_place).
# ---------------------------------------------------------------------------

_EWMA_SQL = """
WITH days AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
maps AS (
  SELECT user_id, d,
         len(vals) AS k,
         list_reduce(vals, (a, v) -> 0.3 * v + 0.7 * a) AS seeded,
         list_reduce(list_prepend(CAST(1.0 AS DOUBLE), vals),
                     (a, v) -> 0.7 * a) AS s,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
                     (a, v) -> 0.3 * v + 0.7 * a) AS o
  FROM days
),
folded AS (
  SELECT user_id,
         list(struct_pack(k := k, seeded := seeded, s := s, o := o)
              ORDER BY d) AS ms
  FROM maps GROUP BY user_id
)
SELECT user_id,
       CAST(list_reduce(list_transform(ms, m -> m.k), (a, b) -> a + b)
            AS BIGINT) AS n_events,
       round(list_reduce(
         list_prepend([ms[1].seeded, CAST(0.0 AS DOUBLE)],
                      list_transform(ms[2:len(ms)], m -> [m.s, m.o])),
         (a, e) -> [e[1] * a[1] + e[2], CAST(0.0 AS DOUBLE)]
       )[1], 6) AS ewma_value
FROM folded
"""


@register("events_ewma", sql=_EWMA_SQL)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    step = lambda a, v: F.lit(0.3) * v + F.lit(0.7) * a  # noqa: E731
    day_sorted = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "v"))),
        lambda s: s["v"],
    )
    vals = F.col("vals")
    # stage 1 — per (user, day): the day's ordered values fold into
    # (k, seeded, s, o); buffer size is bounded by one day's events.
    # ``seeded`` is the within-day sequential EWMA (first value as
    # init — what the chain uses when this is the user's FIRST day);
    # (s, o) is the day's composed linear map (what later days apply).
    days = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("d"),
            "ts",
            "event_id",
            F.col("value").cast("double").alias("v"),
        )
        .groupBy("user_id", "d")
        .agg(day_sorted.alias("vals"))
        .select(
            "user_id",
            "d",
            F.size(vals).alias("k"),
            F.aggregate(
                F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
                F.element_at(vals, 1),
                step,
            ).alias("seeded"),
            F.aggregate(vals, F.lit(1.0), lambda a, v: F.lit(0.7) * a)
            .alias("s"),
            F.aggregate(vals, F.lit(0.0), step).alias("o"),
        )
    )
    # stage 2 — per user: compose the day-ordered pair list. State is
    # O(active days); the first day seeds the chain, later days apply
    # their (scale, offset) map — identical arithmetic in the oracle.
    ms = F.col("ms")
    ewma = F.aggregate(
        F.slice(ms, 2, F.greatest(F.size(ms) - 1, F.lit(0))),
        F.element_at(ms, 1)["seeded"],
        lambda a, e: e["s"] * a + e["o"],
    )
    n_events = F.aggregate(
        ms, F.lit(0).cast("long"), lambda a, e: a + e["k"]
    )
    return (
        days.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("d", "k", "seeded", "s", "o"))
            ).alias("ms")
        )
        .select(
            "user_id",
            n_events.alias("n_events"),
            F.round(ewma, 6).alias("ewma_value"),
        )
    )


# ---------------------------------------------------------------------------
# events_concurrency — sweep-line concurrency: treat each event as a
# 5-minute interval, explode into +1/-1 endpoint deltas, running-sum
# over time = number of simultaneously-open intervals; report the peak
# per event_type. The classic interval-overlap shape (meeting-rooms /
# max concurrent sessions) without a range self-join — O(n log n) sort
# instead of O(n²) pairs. At 100 TB the window partitions by
# event_type and AQE handles the sort; a global (un-partitioned)
# concurrency curve would instead range-repartition on time and
# prefix-sum per partition with a broadcast of per-partition offsets.
# ---------------------------------------------------------------------------

_CONCURRENCY_SQL = """
SELECT event_type,
       CAST(max(running) AS BIGINT) AS peak_concurrency,
       CAST(count(*) AS BIGINT)     AS n_endpoints
FROM (
  SELECT event_type, pt, delta,
         sum(delta) OVER (
           PARTITION BY event_type
           ORDER BY pt, delta DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS running
  FROM (
    SELECT event_type, event_id, ts AS pt, 1 AS delta FROM events
    UNION ALL
    SELECT event_type, event_id,
           ts + INTERVAL 5 MINUTE AS pt, -1 AS delta
    FROM events
  )
)
GROUP BY event_type
"""


@register("events_concurrency", sql=_CONCURRENCY_SQL)
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").select("event_type", "event_id", "ts")
    starts = ev.select(
        "event_type",
        "event_id",
        F.col("ts").alias("pt"),
        F.lit(1).alias("delta"),
    )
    ends = ev.select(
        "event_type",
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("pt"),
        F.lit(-1).alias("delta"),
    )
    # delta DESC at equal timestamps: an interval ending exactly when
    # another starts counts as overlapping (inclusive endpoints) —
    # the same tie rule the oracle uses
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("pt"), F.col("delta").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = starts.unionByName(ends).withColumn(
        "running", F.sum("delta").over(w)
    )
    return swept.groupBy("event_type").agg(
        F.max("running").cast("long").alias("peak_concurrency"),
        F.count(F.lit(1)).cast("long").alias("n_endpoints"),
    )


# ---------------------------------------------------------------------------
# events_rolling_wau — trailing-7-day distinct users per day (rolling
# WAU): sliding-window DISTINCT is the aggregate windows can't do
# (collect_set over a range frame materializes per-row sets). The
# scalable form: dedup to (day, user) grain first, explode each row
# into the <=7 report days it influences, then one exact
# countDistinct per day. Work is 7× the DAILY grain — not 7× the raw
# events — and both shuffles are on small keys. Report days are
# clamped to days that actually occur.
# ---------------------------------------------------------------------------

_WAU_SQL = """
WITH days AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
expanded AS (
  SELECT day + to_days(CAST(o.i AS INTEGER)) AS report_day, user_id
  FROM days, unnest(generate_series(0, 6)) AS o(i)
)
SELECT strftime(report_day, '%Y-%m-%d') AS report_day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS wau
FROM expanded
WHERE report_day IN (SELECT day FROM days)
GROUP BY report_day
"""


@register("events_rolling_wau", sql=_WAU_SQL)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    days = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    expanded = days.select(
        "day",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
    ).select(F.date_add("day", F.col("i")).alias("report_day"), "user_id")
    observed = days.select("day").distinct()
    return (
        expanded.join(
            F.broadcast(observed),
            expanded.report_day == observed.day,
            "left_semi",
        )
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
        .select(
            F.date_format("report_day", "yyyy-MM-dd").alias("report_day"),
            "wau",
        )
    )


# ---------------------------------------------------------------------------
# events_user_gaps — per-user inter-event-gap statistics, production
# form: a lag window (one shuffle on user_id) feeding a partial-agg
# groupBy, entirely inside whole-stage codegen. Microsecond integers
# end-to-end, so it is hash-identical to the DuckDB oracle.
#
# events_user_gaps_pandas is the same computation through the
# grouped-map Python surface (applyInPandas): each user's history
# arrives as one Arrow batch, is sorted deterministically, and reduced
# imperatively. It exists as the registered, oracle-checked demo of
# the per-key Python escape hatch (sessionized features, sequence
# models) — and as the measured "UDF tax" datapoint: ~10× the window
# plan's wall time at sf0.1. The engine's expression-first policy
# exists because of that number; reach for applyInPandas only when
# the logic truly can't be a window/agg.
# ---------------------------------------------------------------------------

_USER_GAPS_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(count(gap_us) AS BIGINT) AS n_gaps,
       CAST(max(gap_us) AS BIGINT)   AS max_gap_us,
       CAST(sum(gap_us) AS BIGINT)   AS total_gap_us
FROM g GROUP BY user_id
"""


@register("events_user_gaps", sql=_USER_GAPS_SQL)
def events_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.withColumn("gap_us", gap)
        .groupBy("user_id")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            F.sum("gap_us").cast("long").alias("total_gap_us"),
        )
    )


@register("events_user_gaps_pandas", sql=_USER_GAPS_SQL)
def events_user_gaps_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = T(spark, sf_dir, "events").select("user_id", "event_id", "ts")

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        us = pdf["ts"].astype("int64") // 1000  # ns → µs, exact ints
        d = us.diff().dropna()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_gaps": [len(d)],
                "max_gap_us": [int(d.max()) if len(d) else None],
                "total_gap_us": [int(d.sum()) if len(d) else None],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        gaps,
        schema="user_id long, n_gaps long, max_gap_us long, total_gap_us long",
    )


# ---------------------------------------------------------------------------
# events_scd2 — slowly-changing-dimension type-2 build: collapse each
# user's event-type stream into validity intervals (valid_from,
# valid_to, is_current), the dimension-table shape every warehouse
# derives from a change feed. Gaps-and-islands: one shuffle on
# user_id, then a change-flag lag window, a running-sum island id over
# the SAME partitioning (no second exchange), a (user, island) agg,
# and a lead window for the closing timestamp. Deterministic
# (ts, event_id) ordering pins tie-handling across engines.
# ---------------------------------------------------------------------------

_SCD2_SQL = """
WITH e AS (
  SELECT user_id, event_id, ts, event_type FROM events
),
marked AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT *, sum(chg) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS island
  FROM marked
),
spans AS (
  SELECT user_id, island, min(event_type) AS event_type,
         min(ts) AS valid_from, count(*) AS n_events
  FROM islands GROUP BY user_id, island
)
SELECT user_id, event_type,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(lead(valid_from) OVER (
         PARTITION BY user_id ORDER BY valid_from
       ), '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       CAST(n_events AS BIGINT) AS n_events,
       lead(valid_from) OVER (
         PARTITION BY user_id ORDER BY valid_from
       ) IS NULL AS is_current
FROM spans
"""


@register("events_scd2", sql=_SCD2_SQL)
def events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("user_id", "island").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w2)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return spans.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format(nxt, fmt).alias("valid_to"),
        F.col("n_events").cast("long").alias("n_events"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# events_rolling_median — trailing-7-day median of daily revenue per
# event type: a HOLISTIC aggregate over a bounded window frame, the
# shape Spark has no native window function for. The daily pre-agg
# shrinks the window input to days×types rows (never event-grain), the
# frame collects ≤7 exact-decimal values per row, and the median is
# row-local array math with the standard half-sum interpolation for
# even counts — bit-identical to DuckDB's windowed median.
# ---------------------------------------------------------------------------

_ROLLING_MEDIAN_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS rev
  FROM events GROUP BY event_type, day
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       round(median(rev) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 3) AS rolling_median_rev
FROM daily
"""


@register("events_rolling_median", sql=_ROLLING_MEDIAN_SQL)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("rev")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    vals = F.array_sort(F.collect_list("rev").over(w))
    n = F.size(vals)
    lo = F.element_at(vals, F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(vals, F.ceil((n + 1) / 2).cast("int"))
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        # round at 3dp, not 2: the half-sum of two 2dp values is EXACT
        # at 3 decimals, so no cross-engine half-way boundary exists;
        # rounding to 2 would sit on .xx5 ties where Spark (decimal
        # HALF_UP) and DuckDB (scaled-binary) disagree — see compat.py
        F.round((lo + hi) / 2, 3).alias("rolling_median_rev"),
    )


# ---------------------------------------------------------------------------
# events_changepoint — CUSUM changepoint detection per event type: the
# day where the cumulative deviation from the series mean peaks (the
# standard "when did behavior shift" monitor). Kept EXACTLY integer:
# with daily counts x_i, CUSUM_t·n = S_t·n − t·total is an integer, so
# the argmax needs no float comparisons at all and both engines pick
# the identical day (earliest-day tie-break). One daily pre-agg, one
# window partition per type over days-sized input, one final argmax.
# ---------------------------------------------------------------------------

_CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS x
  FROM events GROUP BY event_type, day
),
cum AS (
  SELECT event_type, day, x,
         sum(x) OVER w AS s_t,
         row_number() OVER w AS t,
         sum(x) OVER (PARTITION BY event_type) AS total,
         count(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)
),
dev AS (
  SELECT event_type, day, n_days,
         abs(s_t * n_days - t * total) AS dev_n
  FROM cum
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS changepoint_day,
       round(CAST(dev_n AS DOUBLE) / n_days, 4) AS cusum_peak,
       CAST(n_days AS BIGINT) AS n_days
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY dev_n DESC, day
  ) AS rnk FROM dev
) WHERE rnk = 1
"""


@register("events_changepoint", sql=_CHANGEPOINT_SQL)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("x").over(w).alias("s_t"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("day")
        ).alias("t"),
        F.sum("x").over(full).alias("total"),
        F.count(F.lit(1)).over(full).alias("n_days"),
    )
    dev = cum.select(
        "event_type",
        "day",
        "n_days",
        F.abs(
            F.col("s_t") * F.col("n_days") - F.col("t") * F.col("total")
        ).alias("dev_n"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("dev_n").desc(), F.col("day")
    )
    return (
        dev.withColumn("rnk", F.row_number().over(pick))
        .filter(F.col("rnk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("changepoint_day"),
            F.round(
                F.col("dev_n").cast("double") / F.col("n_days"), 4
            ).alias("cusum_peak"),
            F.col("n_days").cast("long").alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# events_autocorr — calendar-lag autocorrelation of the daily event
# count per type, lags 1..7 days: the periodicity diagnostic behind
# seasonality detection (a weekly cycle shows up as a lag-7 peak).
# Exactness recipe (same as agg_correlation): the series values are
# INTEGER daily counts, so the five moments are exact BIGINT sums —
# order-free under any partitioning — and the single float Pearson
# expression at the end is evaluated with identical IEEE ops in both
# engines, then rounded. Shape: one hash-agg to the daily grain
# (days×types rows — tiny at any corpus scale), a 7-way lag fan-out on
# that GRAIN (never on raw events), one equi self-join per (type,
# day+k), one moment agg. No window over raw data, no range self-join.
# ---------------------------------------------------------------------------

AUTOCORR_MAX_LAG = 7

_AUTOCORR_SQL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY event_type, day
),
lags AS (SELECT unnest(generate_series(1, {AUTOCORR_MAX_LAG})) AS k),
pairs AS (
  SELECT a.event_type, l.k, a.c AS x, b.c AS y
  FROM daily a
  CROSS JOIN lags l
  JOIN daily b ON b.event_type = a.event_type AND b.day = a.day + l.k
),
m AS (
  SELECT event_type, k, count(*) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(y*y) AS DOUBLE) AS syy,
         CAST(sum(x*y) AS DOUBLE) AS sxy
  FROM pairs GROUP BY event_type, k
)
SELECT event_type, CAST(k AS BIGINT) AS lag_days, n,
       round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)
         AS autocorr
FROM m
WHERE (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
"""


@register("events_autocorr", sql=_AUTOCORR_SQL)
def events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    ev = T(spark, sf_dir, "events")
    # persist the daily grain: both self-join sides read it, and at scale
    # one scan of the raw events (the only big input) must not run twice
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = daily.alias("a")
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("day").alias("bday"),
        F.col("c").alias("y"),
    )
    pairs = (
        a.withColumn(
            "k", F.explode(F.sequence(F.lit(1), F.lit(AUTOCORR_MAX_LAG)))
        )
        .join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bday") == F.col("day") + F.col("k").cast("long")),
        )
        .select("event_type", "k", F.col("c").alias("x"), "y")
    )
    x, y = F.col("x"), F.col("y")
    m = pairs.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return (
        m.filter((vx > 0) & (vy > 0))
        .select(
            "event_type",
            F.col("k").cast("long").alias("lag_days"),
            "n",
            F.round((n * sxy - sx * sy) / F.sqrt(vx * vy), 6).alias(
                "autocorr"
            ),
        )
    )


# ---------------------------------------------------------------------------
# events_rfm — recency/frequency/monetary segmentation of purchase
# behavior: one pass to the per-user grain (exact integer cents), then
# ntile(5) scores WITHOUT a global window (round 10; the former three
# unpartitioned ntile windows serialized the user grain through one
# task). ntile is rank arithmetic: with n users the t-th quintile ends
# at exact rank R_t = t*(n div 5) + least(t, n mod 5), so the score of
# a row is 1 + #(boundary rows strictly before it) in the total order
# (metric, user_id). The four boundary ROWS per metric are found with
# the orders_exact_median bucket-refinement technique — a bucket-grain
# histogram + partitioned cumulative window locates each target rank's
# bucket, a row_number over just the (≤4 per metric) boundary buckets
# extracts the exact (key, user_id) tuples — and the 12 boundary
# tuples fold to ONE broadcast row whose lexicographic struct
# comparisons assign all three scores in a single projection. Ties
# break by user_id exactly as the oracle's ntile ORDER BY does, and
# duplicate boundaries (n < 5) reproduce ntile's empty-tile jumps.
# Score 5 = best (most recent / most frequent / highest spend). At any
# corpus scale every window is partitioned (metric / metric×tile) and
# sees bucket-grain input; the event scan is the only corpus pass.
# ---------------------------------------------------------------------------

_RFM_SQL = """
WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events),
per_user AS (
  SELECT user_id,
         date_diff('day', max(CAST(ts AS DATE)), any_value(maxd))
           AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM events CROSS JOIN anchor
  WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT user_id,
       CAST(recency_days AS BIGINT) AS recency_days,
       frequency, monetary_cents,
       CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS BIGINT)
         AS r_score,
       CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS BIGINT)
         AS f_score,
       CAST(ntile(5) OVER (ORDER BY monetary_cents, user_id) AS BIGINT)
         AS m_score
FROM per_user
"""


_RFM_METRICS = ("r", "f", "m")


@register("events_rfm", sql=_RFM_SQL)
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    grain = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_d"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )
    # anchor = corpus max date, derived from the per-user grain so the
    # raw events scan runs ONCE (max over users of per-user max)
    anchor = grain.agg(F.max("last_d").alias("maxd"))
    # ascending sort keys: score 5 = most recent / frequent / spendy,
    # so r ranks by NEGATED recency (ntile ... ORDER BY recency DESC)
    keyed = (
        grain.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("maxd", "last_d").cast("long").alias("recency_days"),
            F.col("frequency").cast("long").alias("frequency"),
            "monetary_cents",
        )
        .withColumn("key_r", -F.col("recency_days"))
        .withColumn("key_f", F.col("frequency"))
        .withColumn("key_m", F.col("monetary_cents"))
        .localCheckpoint(eager=False)  # one scan feeds hist + bounds + scores
    )
    # (metric, key) long form; monetary is bucketed at $10 grain, the
    # day/count metrics at unit grain — histograms stay value-range-
    # bounded while each boundary bucket holds a value-local row set
    # (the refine_fraction of orders_exact_median; shrink widths or add
    # a second refinement level if a bucket ever gets corpus-dense)
    mk = keyed.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"), F.col(f"key_{m}").alias("key")
                    )
                    for m in _RFM_METRICS
                ]
            )
        ).alias("mk"),
    ).select("user_id", "mk.m", "mk.key")
    width = F.when(F.col("m") == "m", F.lit(1000)).otherwise(F.lit(1))
    mk = mk.withColumn(
        "bucket", F.floor(F.col("key") / width).cast("long")
    ).localCheckpoint(eager=False)
    hist = mk.groupBy("m", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = (
        Window.partitionBy("m")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "m",
        "bucket",
        "c",
        F.sum("c").over(wcum).alias("cum_c"),
        F.sum("c").over(Window.partitionBy("m")).alias("n"),
    )
    # target rank of each quintile's LAST row; first bucket reaching it
    # carries the boundary (min-struct = min_by bucket)
    tiles = spark.range(1, 5).select(F.col("id").cast("int").alias("t"))
    tgt = (
        cum.crossJoin(F.broadcast(tiles))
        .withColumn(
            "rk",
            F.col("t") * F.expr("n div 5")
            + F.least(F.col("t").cast("long"), F.col("n") % 5),
        )
        .filter(F.col("cum_c") >= F.col("rk"))
        .groupBy("m", "t", "rk")
        .agg(
            F.min(
                F.struct(
                    F.col("bucket").alias("tb"),
                    (F.col("cum_c") - F.col("c")).alias("rows_before"),
                )
            ).alias("hit")
        )
        .select(
            "m",
            "t",
            "rk",
            F.col("hit.tb").alias("bucket"),
            F.col("hit.rows_before").alias("rows_before"),
        )
    )
    # rank ONLY the boundary buckets' rows — each (m, t) window is one
    # bucket, never the user grain
    wloc = Window.partitionBy("m", "t").orderBy("key", "user_id")
    bnd = (
        mk.join(F.broadcast(tgt), ["m", "bucket"])
        .withColumn("r", F.row_number().over(wloc))
        .filter(F.col("r") == F.col("rk") - F.col("rows_before"))
        .select(
            "m",
            "t",
            F.struct(
                F.col("key").alias("key"), F.col("user_id").alias("user_id")
            ).alias("b"),
        )
    )
    bounds = bnd.groupBy().agg(
        *[
            F.min(
                F.when((F.col("m") == m) & (F.col("t") == t), F.col("b"))
            ).alias(f"b_{m}{t}")
            for m in _RFM_METRICS
            for t in (1, 2, 3, 4)
        ]
    )

    def score(m: str) -> F.Column:
        x = F.struct(
            F.col(f"key_{m}").alias("key"), F.col("user_id").alias("user_id")
        )
        s = F.lit(1).cast("long")
        for t in (1, 2, 3, 4):
            s = s + (x > F.col(f"b_{m}{t}")).cast("long")
        return s.alias(f"{m}_score")

    return keyed.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        score("r"),
        score("f"),
        score("m"),
    )


# ---------------------------------------------------------------------------
# events_markov — first-order journey transition matrix: P(next event
# type | current type) across per-user event sequences. One window lag
# over (user_id, ts, event_id) — the total tie-break makes the
# successor well-defined on simultaneous timestamps — then a pair
# count and a per-source normalization. Counts are exact integers and
# the single probability division is rounded, so the matrix is
# oracle-identical. The window partitions by user: the shuffle is the
# per-user grain, never a self-join of the corpus.
# ---------------------------------------------------------------------------

_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
),
pairs AS (
  SELECT cur, nxt, count(*) AS n
  FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
),
totals AS (SELECT cur, sum(n) AS tot FROM pairs GROUP BY cur)
SELECT p.cur AS from_type, p.nxt AS to_type, p.n AS n_transitions,
       round(CAST(p.n AS DOUBLE) / t.tot, 6) AS probability
FROM pairs p JOIN totals t ON t.cur = p.cur
"""


@register("events_markov", sql=_MARKOV_SQL)
def events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wtot = Window.partitionBy("cur")
    return pairs.select(
        F.col("cur").alias("from_type"),
        F.col("nxt").alias("to_type"),
        F.col("n").alias("n_transitions"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wtot), 6
        ).alias("probability"),
    )


# ---------------------------------------------------------------------------
# events_holt_forecast — Holt's linear-trend smoothing of the daily
# event count per type, the two-state recursion (level, trend) no
# window frame can express. Same bit-identical recipe as events_ewma,
# extended to two-state [x, level, trend] LIST accumulators: both
# engines fold the same totally-ordered day list left-to-right, each
# element pre-seeded as its own initial state [x, x, 0] so the first
# element IS the init (DuckDB list_reduce has no explicit initial
# accumulator), and every IEEE op appears in the same order in both
# lambdas. The accumulator is a LIST, not a STRUCT, deliberately:
# DuckDB v1.0.0's list_reduce updates struct accumulator fields IN
# PLACE sequentially, so a later field's expression reads the earlier
# field's NEW value — a two-state recursion silently corrupts. List
# construction is aliasing-safe (verified by the crossed-reference
# probe in the test suite). One shuffle to the daily grain; the fold
# is row-local per type.
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.5
HOLT_BETA = 0.3

_HOLT_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY event_type, day
),
series AS (
  SELECT event_type,
         list([c, c, CAST(0.0 AS DOUBLE)] ORDER BY day) AS s
  FROM daily GROUP BY event_type
),
folded AS (
  SELECT event_type, len(s) AS n_days,
         list_reduce(s, (acc, e) -> [
           e[1],
           {HOLT_ALPHA} * e[1] + {1 - HOLT_ALPHA} * (acc[2] + acc[3]),
           {HOLT_BETA} * (({HOLT_ALPHA} * e[1]
                 + {1 - HOLT_ALPHA} * (acc[2] + acc[3])) - acc[2])
                + {1 - HOLT_BETA} * acc[3]
         ]) AS st
  FROM series
)
SELECT event_type,
       CAST(n_days AS BIGINT)        AS n_days,
       round(st[2], 6)               AS level,
       round(st[3], 6)               AS trend,
       round(st[2] + st[3], 6)       AS forecast_next
FROM folded
"""


@register("events_holt_forecast", sql=_HOLT_SQL)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    seeded = F.transform(
        F.array_sort(F.collect_list(F.struct("day", "c"))),
        lambda r: F.array(r["c"], r["c"], F.lit(0.0)),
    )
    series = daily.groupBy("event_type").agg(seeded.alias("s"))
    s = F.col("s")
    a, a1 = F.lit(HOLT_ALPHA), F.lit(1 - HOLT_ALPHA)
    g, g1 = F.lit(HOLT_BETA), F.lit(1 - HOLT_BETA)

    def step(acc, e):
        x = F.element_at(e, 1)
        l_old, b_old = F.element_at(acc, 2), F.element_at(acc, 3)
        l_new = a * x + a1 * (l_old + b_old)
        return F.array(x, l_new, g * (l_new - l_old) + g1 * b_old)

    st = F.aggregate(
        F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
        F.element_at(s, 1),
        step,
    )
    return series.select(
        "event_type",
        F.size(s).cast("long").alias("n_days"),
        F.round(F.element_at(st, 2), 6).alias("level"),
        F.round(F.element_at(st, 3), 6).alias("trend"),
        F.round(
            F.element_at(st, 2) + F.element_at(st, 3), 6
        ).alias("forecast_next"),
    )


# ---------------------------------------------------------------------------
# events_seasonal_anomaly — the seasonality-aware upgrade of
# events_anomaly: each hour's event count is z-scored against the
# baseline of the SAME (day-of-week, hour-of-day) slot, so a quiet
# Sunday 3am is not "anomalous" merely for being quieter than Monday
# noon. Day-of-week is epoch-day mod 7 in BOTH engines (Spark and
# DuckDB disagree on dayofweek() numbering); moments are exact BIGINT
# sums on the hourly grain, and the output is the top-20 hours by |z|
# (TakeOrdered — no vacuous-threshold tuning, never an empty result).
# ---------------------------------------------------------------------------

SEASONAL_TOP = 20
_SEASONAL_MIN_SLOT = 4  # slots with <4 observations have no baseline

_SEASONAL_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hod,
         count(*) AS c
  FROM events GROUP BY h, dow, hod
),
base AS (
  SELECT dow, hod, count(*) AS n,
         CAST(sum(c) AS DOUBLE) AS s1, CAST(sum(c*c) AS DOUBLE) AS s2
  FROM hourly GROUP BY dow, hod
),
scored AS (
  SELECT strftime(h.h, '%Y-%m-%d %H:%M:%S') AS window_start,
         h.dow, h.hod, h.c AS n_events,
         (h.c - b.s1 / b.n)
           / sqrt(b.s2 / b.n - (b.s1 / b.n) * (b.s1 / b.n)) AS z
  FROM hourly h JOIN base b ON b.dow = h.dow AND b.hod = h.hod
  WHERE b.n >= {_SEASONAL_MIN_SLOT}
    AND (b.s2 * b.n - b.s1 * b.s1) > 0
)
SELECT window_start, dow, hod, n_events, round(z, 6) AS zscore
FROM scored
ORDER BY abs(z) DESC, window_start
LIMIT {SEASONAL_TOP}
"""


@register("events_seasonal_anomaly", sql=_SEASONAL_SQL)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7)
        .cast("long")
        .alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("c"))
    base = hourly.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("double").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    z = (F.col("c") - mean) / F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    return (
        hourly.join(F.broadcast(base), ["dow", "hod"])
        .filter(
            (F.col("n") >= _SEASONAL_MIN_SLOT)
            & (F.col("s2") * F.col("n") - F.col("s1") * F.col("s1") > 0)
        )
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "dow",
            "hod",
            F.col("c").alias("n_events"),
            F.round(z, 6).alias("zscore"),
            F.abs(z).alias("_absz"),
        )
        .orderBy(F.col("_absz").desc(), "window_start")
        .limit(SEASONAL_TOP)
        .drop("_absz")
    )


# ---------------------------------------------------------------------------
# orders_interarrival — per-customer order inter-arrival statistics
# (mean/min/max days between consecutive orders): the purchase-cadence
# input to CLV and churn models. One lag window over the per-customer
# grain with a total (o_orderdate, o_orderkey) tie-break; day gaps are
# exact integers so every statistic is order-free.
# ---------------------------------------------------------------------------

_INTERARRIVAL_SQL = """
WITH seq AS (
  SELECT o_custkey,
         date_diff('day',
           lag(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ),
           CAST(o_orderdate AS DATE)) AS gap
  FROM orders
)
SELECT o_custkey,
       CAST(count(gap) AS BIGINT)      AS n_gaps,
       CAST(min(gap) AS BIGINT)        AS min_days,
       CAST(max(gap) AS BIGINT)        AS max_days,
       round(CAST(sum(gap) AS DOUBLE) / count(gap), 6) AS mean_days
FROM seq
WHERE gap IS NOT NULL
GROUP BY o_custkey
"""


@register("orders_interarrival", sql=_INTERARRIVAL_SQL)
def orders_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return seq.groupBy("o_custkey").agg(
        F.count("gap").cast("long").alias("n_gaps"),
        F.min("gap").cast("long").alias("min_days"),
        F.max("gap").cast("long").alias("max_days"),
        F.round(
            F.sum("gap").cast("double") / F.count("gap"), 6
        ).alias("mean_days"),
    )


# ---------------------------------------------------------------------------
# events_streaks — gaps-and-islands: the longest run of CONSECUTIVE
# active days per user, then the corpus-wide histogram of longest-streak
# lengths (the retention metric engagement teams chart). Plan: the
# window input is the distinct (user, day) grain — bounded by
# |users| x calendar days regardless of event volume, so a bot firing
# millions of events in one day contributes ONE row. Island id is the
# classic day_no - row_number() difference (constant within a
# consecutive run); two hash aggregations finish it. No reference
# counterpart (green-field analytics surface, SURVEY §2.10).
# ---------------------------------------------------------------------------

_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
isl AS (
  SELECT user_id,
         datediff('day', DATE '1990-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM days
),
runs AS (
  SELECT user_id, island, count(*) AS run_len
  FROM isl GROUP BY user_id, island
),
longest AS (
  SELECT user_id, max(run_len) AS longest_streak FROM runs GROUP BY user_id
)
SELECT CAST(longest_streak AS BIGINT) AS streak_days,
       CAST(count(*) AS BIGINT)       AS n_users
FROM longest
GROUP BY longest_streak
"""


@register("events_streaks", sql=_STREAKS_SQL)
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        T(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id",
        (
            F.datediff("day", F.lit("1990-01-01")) - F.row_number().over(w)
        ).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    longest = runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak")
    )
    return longest.groupBy(
        F.col("longest_streak").cast("long").alias("streak_days")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))


# ---------------------------------------------------------------------------
# events_funnel_timing — conversion LATENCY for two funnel edges
# (signup→purchase, click→purchase): per converting user the time from
# first entry event to the first purchase at-or-after it, summarized as
# exact p50/p90/max and mean. events_funnel counts conversions; this
# measures how long they take — the product-analytics pair.
#
# Scale shape: one conditional agg to the per-user first-entry grain,
# one equi join of purchase events against it (co-partitioned on
# user_id), a second per-user agg — never an event-grain window. The
# percentiles are EXACT discrete quantiles computed with the same
# closed-form trick as skew_profile's Gini: bucket latency to integer
# minutes, aggregate to the distinct-minute grain (bounded by the time
# span, not |users|), one cumulative window over that tiny frame, and
# pick the smallest bucket whose cumulative count reaches
# ceil(q·n) = n − n·(1−q) in pure integer arithmetic — no float rank,
# no interpolation ambiguity between engines.
# ---------------------------------------------------------------------------

_FUNNEL_TIMING_SQL = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
         min(CASE WHEN event_type = 'click'  THEN ts END) AS c_ts
  FROM events GROUP BY user_id
),
conv AS (
  SELECT e.user_id,
         min(CASE WHEN e.ts >= f.s_ts THEN e.ts END) AS p_after_s,
         min(CASE WHEN e.ts >= f.c_ts THEN e.ts END) AS p_after_c,
         min(f.s_ts) AS s_ts, min(f.c_ts) AS c_ts
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
),
lat AS (
  SELECT 'signup->purchase' AS edge,
         epoch_us(p_after_s) - epoch_us(s_ts) AS us
  FROM conv WHERE p_after_s IS NOT NULL
  UNION ALL
  SELECT 'click->purchase' AS edge,
         epoch_us(p_after_c) - epoch_us(c_ts) AS us
  FROM conv WHERE p_after_c IS NOT NULL
),
buckets AS (
  SELECT edge, us // 60000000 AS lat_min, count(*) AS c,
         sum(us) AS sum_us
  FROM lat GROUP BY edge, lat_min
),
cum AS (
  SELECT edge, lat_min, c, sum_us,
         sum(c) OVER (PARTITION BY edge ORDER BY lat_min
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_c,
         sum(c) OVER (PARTITION BY edge) AS n,
         sum(sum_us) OVER (PARTITION BY edge) AS tot_us
  FROM buckets
)
SELECT edge,
       CAST(max(n) AS BIGINT) AS n_conversions,
       CAST(min(CASE WHEN cum_c >= n - n // 2  THEN lat_min END) AS BIGINT)
         AS p50_min,
       CAST(min(CASE WHEN cum_c >= n - n // 10 THEN lat_min END) AS BIGINT)
         AS p90_min,
       CAST(max(lat_min) AS BIGINT) AS max_min,
       round(CAST(max(tot_us) AS DOUBLE) / max(n) / 60000000, 6)
         AS mean_min
FROM cum
GROUP BY edge
"""


@register("events_funnel_timing", sql=_FUNNEL_TIMING_SQL)
def events_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "s_ts"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "c_ts"
        ),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("ts") >= F.col("s_ts"), F.col("ts"))).alias(
                "p_after_s"
            ),
            F.min(F.when(F.col("ts") >= F.col("c_ts"), F.col("ts"))).alias(
                "p_after_c"
            ),
            F.min("s_ts").alias("s_ts"),
            F.min("c_ts").alias("c_ts"),
        )
    )
    lat = conv.filter(F.col("p_after_s").isNotNull()).select(
        F.lit("signup->purchase").alias("edge"),
        (F.unix_micros("p_after_s") - F.unix_micros("s_ts")).alias("us"),
    ).unionByName(
        conv.filter(F.col("p_after_c").isNotNull()).select(
            F.lit("click->purchase").alias("edge"),
            (F.unix_micros("p_after_c") - F.unix_micros("c_ts")).alias("us"),
        )
    )
    buckets = lat.groupBy(
        "edge", F.expr("us div 60000000").alias("lat_min")
    ).agg(F.count(F.lit(1)).alias("c"), F.sum("us").alias("sum_us"))
    we = Window.partitionBy("edge")
    cum = buckets.select(
        "edge",
        "lat_min",
        "c",
        F.sum("c")
        .over(
            we.orderBy("lat_min").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cum_c"),
        F.sum("c").over(we).alias("n"),
        F.sum("sum_us").over(we).alias("tot_us"),
    )
    t50 = F.col("n") - F.expr("n div 2")
    t90 = F.col("n") - F.expr("n div 10")
    return cum.groupBy("edge").agg(
        F.max("n").cast("long").alias("n_conversions"),
        F.min(F.when(F.col("cum_c") >= t50, F.col("lat_min")))
        .cast("long")
        .alias("p50_min"),
        F.min(F.when(F.col("cum_c") >= t90, F.col("lat_min")))
        .cast("long")
        .alias("p90_min"),
        F.max("lat_min").cast("long").alias("max_min"),
        F.round(
            F.max("tot_us").cast("double") / F.max("n") / F.lit(60000000), 6
        ).alias("mean_min"),
    )


# ---------------------------------------------------------------------------
# events_dau_mau_stickiness — the DAU/MAU engagement ratio per calendar
# month: average daily active users divided by monthly active users.
# Plan: both numerator and denominator reduce the event stream through
# the distinct (user, day) grain (bounded by users × calendar, immune
# to per-user event volume); DAU is a count per day then an exact
# integer sum per month, MAU a distinct count per month. One shuffle
# family keyed on user/day prefixes, no window.
# ---------------------------------------------------------------------------

_DAU_MAU_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
         strftime(CAST(ts AS DATE), '%Y-%m') AS month
  FROM events
),
dau AS (
  SELECT month, day, count(*) AS dau FROM ud GROUP BY month, day
),
mau AS (
  SELECT month, count(DISTINCT user_id) AS mau FROM ud GROUP BY month
)
SELECT d.month,
       CAST(count(*) AS BIGINT)      AS n_days,
       CAST(sum(d.dau) AS BIGINT)    AS user_days,
       CAST(max(m.mau) AS BIGINT)    AS mau,
       round(CAST(sum(d.dau) AS DOUBLE) / count(*) / max(m.mau), 6)
         AS stickiness
FROM dau d JOIN mau m ON d.month = m.month
GROUP BY d.month
"""


@register("events_dau_mau_stickiness", sql=_DAU_MAU_SQL)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        T(spark, sf_dir, "events")
        .select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.date_format(F.to_date("ts"), "yyyy-MM").alias("month"),
        )
        .distinct()
    )
    dau = ud.groupBy("month", "day").agg(F.count(F.lit(1)).alias("dau"))
    mau = ud.groupBy("month").agg(F.count_distinct("user_id").alias("mau"))
    return (
        dau.join(mau, "month")
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("dau").cast("long").alias("user_days"),
            F.max("mau").cast("long").alias("mau"),
            F.round(
                F.sum("dau").cast("double") / F.count(F.lit(1)) / F.max("mau"),
                6,
            ).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# events_forecast_eval — BACKTEST of the Holt forecaster: hold out the
# last 3 calendar days, fit level/trend on the rest (the identical
# bit-deterministic fold events_holt_forecast uses), and score
# forecast level + h·trend against each held-out day's actual count.
# The self-measuring gate for the forecasting family — the number an
# anomaly-detection threshold is calibrated against. Output is the
# per-(type, horizon) error table: NO cross-row float aggregation
# exists (each error is row-local), so there is nothing to make
# order-nondeterministic. Plan: one scan to the daily grain, the
# train/holdout split via one broadcast max-day scalar, the fold
# row-local per type.
# ---------------------------------------------------------------------------

_FORECAST_EVAL_HOLDOUT = 3

_FORECAST_EVAL_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY event_type, day
),
cutoff AS (SELECT max(day) - {_FORECAST_EVAL_HOLDOUT} AS cut FROM daily),
series AS (
  SELECT event_type,
         list([c, c, CAST(0.0 AS DOUBLE)] ORDER BY day) AS s
  FROM daily CROSS JOIN cutoff WHERE day <= cut
  GROUP BY event_type
),
folded AS (
  SELECT event_type, len(s) AS n_train_days,
         list_reduce(s, (acc, e) -> [
           e[1],
           {HOLT_ALPHA} * e[1] + {1 - HOLT_ALPHA} * (acc[2] + acc[3]),
           {HOLT_BETA} * (({HOLT_ALPHA} * e[1]
                 + {1 - HOLT_ALPHA} * (acc[2] + acc[3])) - acc[2])
                + {1 - HOLT_BETA} * acc[3]
         ]) AS st
  FROM series
)
SELECT d.event_type,
       CAST(d.day - c.cut AS BIGINT)               AS horizon,
       CAST(f.n_train_days AS BIGINT)              AS n_train_days,
       CAST(d.c AS BIGINT)                         AS actual,
       round(f.st[2] + (d.day - c.cut) * f.st[3], 6) AS forecast,
       round(abs(f.st[2] + (d.day - c.cut) * f.st[3] - d.c), 6) AS abs_err
FROM daily d
CROSS JOIN cutoff c
JOIN folded f ON f.event_type = d.event_type
WHERE d.day > c.cut
"""


@register("events_forecast_eval", sql=_FORECAST_EVAL_SQL)
def events_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    cutoff = daily.agg(
        F.date_sub(F.max("day"), _FORECAST_EVAL_HOLDOUT).alias("cut")
    )
    train = daily.crossJoin(F.broadcast(cutoff)).filter(
        F.col("day") <= F.col("cut")
    )
    seeded = F.transform(
        F.array_sort(F.collect_list(F.struct("day", "c"))),
        lambda r: F.array(r["c"], r["c"], F.lit(0.0)),
    )
    series = train.groupBy("event_type").agg(seeded.alias("s"))
    s = F.col("s")
    a, a1 = F.lit(HOLT_ALPHA), F.lit(1 - HOLT_ALPHA)
    g, g1 = F.lit(HOLT_BETA), F.lit(1 - HOLT_BETA)

    def step(acc, e):
        x = F.element_at(e, 1)
        l_old, b_old = F.element_at(acc, 2), F.element_at(acc, 3)
        l_new = a * x + a1 * (l_old + b_old)
        return F.array(x, l_new, g * (l_new - l_old) + g1 * b_old)

    st = F.aggregate(
        F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
        F.element_at(s, 1),
        step,
    )
    folded = series.select(
        "event_type",
        F.size(s).alias("n_train_days"),
        F.element_at(st, 2).alias("level"),
        F.element_at(st, 3).alias("trend"),
    )
    holdout = daily.crossJoin(F.broadcast(cutoff)).filter(
        F.col("day") > F.col("cut")
    )
    h = F.datediff("day", "cut")
    fc = F.col("level") + h * F.col("trend")
    return holdout.join(F.broadcast(folded), "event_type").select(
        "event_type",
        h.cast("long").alias("horizon"),
        F.col("n_train_days").cast("long").alias("n_train_days"),
        F.col("c").cast("long").alias("actual"),
        F.round(fc, 6).alias("forecast"),
        F.round(F.abs(fc - F.col("c")), 6).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# events_user_entropy — behavioral-diversity profile: Shannon entropy
# of each user's event-type mix, reported as the corpus histogram
# (entropy bucket → user count). Bots and scripted accounts sit at the
# entropy extremes, so this is a standard abuse-detection feature.
# Scale shape: one hash agg to the (user, type) grain, one collapse to
# per-user type-count lists (bounded by |event types|), entropy as a
# ROW-LOCAL fold over the type-name-sorted list (the text_entropy
# recipe — same IEEE op order in both engines, so the floats are
# bit-identical), then a tiny histogram agg. No window; no float sum
# ever crosses a shuffle.
# ---------------------------------------------------------------------------

_USER_ENTROPY_SQL = """
WITH tc AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type
),
per_user AS (
  SELECT user_id, list(CAST(c AS DOUBLE) ORDER BY event_type) AS cs,
         sum(c) AS n
  FROM tc GROUP BY user_id
),
ent AS (
  SELECT user_id,
         round(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(cs, c ->
               -(c / n) * log2(c / n))),
           (a, b) -> a + b), 2) AS entropy_bucket
  FROM per_user
)
SELECT entropy_bucket,
       CAST(count(*) AS BIGINT) AS n_users
FROM ent GROUP BY entropy_bucket
"""


@register("events_user_entropy", sql=_USER_ENTROPY_SQL)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    tc = (
        T(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_user = tc.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("event_type", "c"))),
            lambda s: s["c"].cast("double"),
        ).alias("cs"),
        F.sum("c").alias("n"),
    )
    n = F.col("n")
    ent = per_user.select(
        F.round(
            F.aggregate(
                F.transform(
                    "cs", lambda c: -(c / n) * F.log2(c / n)
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ),
            2,
        ).alias("entropy_bucket")
    )
    return ent.groupBy("entropy_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# ---------------------------------------------------------------------------
# events_ab_test — hash-split two-proportion experiment readout: users
# are deterministically assigned to arms by md5(user_id) parity (the
# split every experimentation platform does so assignment survives
# restarts with no assignment table), conversion = user produced >= 1
# purchase event, and the readout is per-arm rates plus the pooled
# two-proportion z statistic. Plan: one pass to the (user, converted)
# grain (hash agg), then a 2-row arm aggregate — the z arithmetic is a
# handful of row-local double ops on exact integer counts, so both
# engines agree bit-for-bit after the final round.
# ---------------------------------------------------------------------------

_AB_TEST_SQL = """
WITH users AS (
  SELECT user_id,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(conv) AS BIGINT) AS n_converted
  FROM users GROUP BY arm
),
wide AS (
  SELECT
    max(CASE WHEN arm = 0 THEN n_users END)     AS n_a,
    max(CASE WHEN arm = 0 THEN n_converted END) AS c_a,
    max(CASE WHEN arm = 1 THEN n_users END)     AS n_b,
    max(CASE WHEN arm = 1 THEN n_converted END) AS c_b
  FROM arms
)
SELECT n_a, c_a, n_b, c_b,
       CAST((2 * CAST((c_a) AS BIGINT) * 1000000 + CAST((n_a) AS BIGINT)) // (2 * CAST((n_a) AS BIGINT)) AS DOUBLE) / 1000000.0 AS rate_a,
       CAST((2 * CAST((c_b) AS BIGINT) * 1000000 + CAST((n_b) AS BIGINT)) // (2 * CAST((n_b) AS BIGINT)) AS DOUBLE) / 1000000.0 AS rate_b,
       round(
         (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
         / NULLIF(sqrt(
             (CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
             * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
             * (1.0 / n_a + 1.0 / n_b)
           ), 0), 6) AS z_score
FROM wide
"""


@register("events_ab_test", sql=_AB_TEST_SQL)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
        "conv",
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("c_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("c_b"),
    )
    n_a, c_a = F.col("n_a"), F.col("c_a")
    n_b, c_b = F.col("n_b"), F.col("c_b")
    pooled = (c_a + c_b).cast("double") / (n_a + n_b)
    se = F.sqrt(
        pooled * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / n_a + F.lit(1.0) / n_b)
    )
    return wide.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        # integer-ratio rounds go through the exact half-up helper:
        # the double round ties on terminating expansions (compat.dratio)
        dratio(c_a, n_a, 6).alias("rate_a"),
        dratio(c_b, n_b, 6).alias("rate_b"),
        F.round(
            (c_a.cast("double") / n_a - c_b.cast("double") / n_b)
            / F.nullif(se, F.lit(0.0)),
            6,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# events_rolling_wau_hll — trailing-7-day distinct users via WINDOWED
# HLL register merge, audited against the exact rolling WAU. This is
# the sketch answer to the sliding-distinct problem: exact rolling
# distinct (events_rolling_wau) must carry the full (user, day) grain
# through every window, while HLL registers are a 64-row-per-day
# mergeable summary — max-merge over any 7-day span gives the span's
# estimate without touching user-grain data again. The register math
# is the portable integer recipe from operators/sketches.py, so even
# the approximate estimate hash-matches across engines; the query
# emits estimate, exact, and realized relative error per day — the
# audit that tells an owner whether 64 registers suffice.
#
# Scale shape: one pass to the (day, user) grain, one to day-grain
# registers (|days| x 64 rows); the 7-day merge joins the tiny day
# scaffold against the register table (|days| x 7 x 64 rows, nothing
# user-grain); the exact side reuses the same day-scaffold join on
# the deduped (user, day) frame. No window function needed at all.
# ---------------------------------------------------------------------------

from codex_data_products_spark.operators.sketches import (  # noqa: E402
    HLL_ALPHA as _WAU_ALPHA,
    HLL_LOW_BITS as _WAU_LOW_BITS,
    HLL_M as _WAU_M,
    _HLL_RMAX as _WAU_RMAX,
    hll_estimate as _wau_hll_estimate,
    hll_register_rows as _wau_register_rows,
)

_WAU_HLL_SQL = f"""
WITH ud AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(user_id AS VARCHAR) AS item
  FROM events
),
days AS (SELECT DISTINCT day FROM ud),
h AS (
  SELECT day,
         (CAST(concat('0x', substring(md5(item), 1, 1)) AS BIGINT) % 8)
           * (CAST(1 AS BIGINT) << 60)
         + CAST(concat('0x', substring(md5(item), 2, 15)) AS BIGINT) AS hv
  FROM ud
),
reg AS (
  SELECT day, hv % {_WAU_M} AS bucket,
         max(CASE WHEN hv // {_WAU_M} > 0
                  THEN {_WAU_LOW_BITS}
                       - length(format('{{:b}}', hv // {_WAU_M})) + 1
                  ELSE {_WAU_LOW_BITS + 1} END) AS rank
  FROM h GROUP BY day, hv % {_WAU_M}
),
merged AS (
  SELECT d.day, r.bucket, max(r.rank) AS rank
  FROM days d
  JOIN reg r ON r.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day, r.bucket
),
est AS (
  SELECT day,
         round({_WAU_ALPHA} * {_WAU_M * _WAU_M} * pow(2.0, {_WAU_RMAX})
               / CAST(sum(CAST(pow(2.0, {_WAU_RMAX} - rank)
                               AS DECIMAL(38,0)))
                      + CAST({_WAU_M} - count(*) AS DECIMAL(38,0))
                        * CAST(pow(2.0, {_WAU_RMAX}) AS DECIMAL(38,0))
                      AS DOUBLE), 4) AS hll_wau
  FROM merged GROUP BY day
),
exact AS (
  SELECT d.day, CAST(count(DISTINCT u.item) AS BIGINT) AS exact_wau
  FROM days d
  JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
)
SELECT strftime(e.day, '%Y-%m-%d') AS day,
       e.exact_wau,
       s.hll_wau,
       round(abs(s.hll_wau - e.exact_wau) / e.exact_wau, 4) AS rel_err
FROM exact e JOIN est s ON s.day = e.day
"""


@register("events_rolling_wau_hll", sql=_WAU_HLL_SQL)
def events_rolling_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    ud = ev.select(
        F.to_date("ts").alias("day"),
        F.col("user_id").cast("string").alias("item"),
    ).distinct()
    days = ud.select("day").distinct()
    reg = _wau_register_rows(ud, "item", ["day"])
    d = days.select(F.col("day").alias("rday"))
    merged = (
        F.broadcast(d)
        .join(
            reg,
            (F.col("day") >= F.date_sub(F.col("rday"), 6))
            & (F.col("day") <= F.col("rday")),
        )
        .groupBy(F.col("rday").alias("day"), "bucket")
        .agg(F.max("rank").alias("rank"))
    )
    est = _wau_hll_estimate(merged, ["day"]).withColumnRenamed(
        "hll_estimate", "hll_wau"
    )
    exact = (
        F.broadcast(d)
        .join(
            ud,
            (F.col("day") >= F.date_sub(F.col("rday"), 6))
            & (F.col("day") <= F.col("rday")),
        )
        .groupBy(F.col("rday").alias("day"))
        .agg(F.count_distinct("item").cast("long").alias("exact_wau"))
    )
    return exact.join(est, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "exact_wau",
        "hll_wau",
        F.round(
            F.abs(F.col("hll_wau") - F.col("exact_wau"))
            / F.col("exact_wau"),
            4,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# events_bitmap_retention — classic D1..D13 retention computed the way
# large-scale analytics stores do it (roaring-bitmap style, e.g.
# ClickHouse retention()/Druid ThetaSketch pipelines): each user's
# activity collapses to ONE 64-bit bitmask of day-offsets from their
# own first active day (bit n set = active on day first+n), built with
# a bit_or aggregate; "retained on day n" is then a pure bitwise test,
# and all 14 retention counters come out of ONE single-row aggregate
# unpivoted to (day_n, n_retained, retention).
#
# Scale shape: (user, day) distinct grain → per-user min-day via a
# window over that bounded grain → one bit_or per user → 14 integer
# sums. Per-user state is exactly 8 bytes regardless of event volume —
# the whole point of the bitmap encoding at 100 TB. Offsets ≥ 64 clamp
# to bit 63 (outside the 14-day readout window, so the clamp never
# affects the answer). All-integer; no float anywhere.
# ---------------------------------------------------------------------------

_BITMAP_RETENTION_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
ud0 AS (
  SELECT user_id, d,
         min(d) OVER (PARTITION BY user_id) AS d0
  FROM ud
),
masks AS (
  SELECT user_id,
         bit_or(CAST(1 AS BIGINT) << least(date_diff('day', d0, d), 63))
           AS mask
  FROM ud0 GROUP BY user_id
),
tot AS (
  SELECT count(*) AS n_users,
         """ + ",\n         ".join(
    f"sum((mask >> {n}) & 1) AS r{n}" for n in range(14)
) + """
  FROM masks
)
SELECT CAST(t.day_n AS BIGINT) AS day_n,
       CAST(t.n_retained AS BIGINT) AS n_retained,
       CAST(tot.n_users AS BIGINT) AS n_users,
       round(CAST(t.n_retained AS DOUBLE) / tot.n_users, 6) AS retention
FROM tot, LATERAL (VALUES """ + ", ".join(
    f"({n}, r{n})" for n in range(14)
) + """) AS t(day_n, n_retained)
"""


@register("events_bitmap_retention", sql=_BITMAP_RETENTION_SQL)
def events_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ud = (
        T(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    ud0 = ud.select(
        "user_id",
        "d",
        F.min("d").over(Window.partitionBy("user_id")).alias("d0"),
    )
    masks = ud0.groupBy("user_id").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), "
                        "least(datediff(d, d0), 63))")).alias("mask")
    )
    aggs = [F.count(F.lit(1)).alias("n_users")] + [
        F.sum(F.shiftright(F.col("mask"), n).bitwiseAND(F.lit(1))).alias(
            f"r{n}"
        )
        for n in range(14)
    ]
    tot = masks.agg(*aggs)
    stack_expr = "stack(14, " + ", ".join(
        f"{n}L, r{n}" for n in range(14)
    ) + ") AS (day_n, n_retained)"
    return tot.selectExpr(stack_expr, "n_users").select(
        F.col("day_n").cast("long").alias("day_n"),
        F.col("n_retained").cast("long").alias("n_retained"),
        F.col("n_users").cast("long").alias("n_users"),
        F.round(
            F.col("n_retained").cast("double") / F.col("n_users"), 6
        ).alias("retention"),
    )


# ---------------------------------------------------------------------------
# scd2_asof_lookup — the point-in-time (PIT) join that closes the SCD2
# loop: events_scd2 BUILDS the versioned dimension; this query USES it
# the way every warehouse does — "which version was valid AS OF time
# t?". For each event, look up the user's regime one hour earlier
# (valid_from <= ts-1h < valid_to) and aggregate the (regime-now,
# regime-then) transition matrix. Facts that predate the user's first
# span land in the 'none' bucket — the correct PIT semantics for
# late-arriving dimension members.
#
# Scale shape: the lookup is a sort-based MERGE, not a join — the
# version-start rows union with the facts, one per-user sort orders
# them, and last(ignore nulls) carries the active version forward, so
# per-key work is O(spans + facts). (The first formulation was an equi
# hash join with the validity range as a residual; each fact matched
# exactly one version but PROBED all of its key's spans — quadratic on
# high-churn keys, measured dominating sf1.0 wall time on the bot
# users. tests/test_edge_cases.py pins merge == range-join semantics.)
# The dimension build windows only within user partitions; the output
# is the |types|² transition grain.
# ---------------------------------------------------------------------------

_SCD2_LOOKUP_SQL = """
WITH e AS (
  SELECT user_id, event_id, ts, event_type FROM events
),
marked AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT *, sum(chg) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS island
  FROM marked
),
spans AS (
  SELECT user_id, island, min(event_type) AS type_then,
         min(ts) AS valid_from
  FROM islands GROUP BY user_id, island
),
dimrows AS (
  SELECT user_id, valid_from AS t, 0 AS kind, island, type_then,
         CAST(NULL AS VARCHAR) AS type_now
  FROM spans
),
factrows AS (
  SELECT user_id, ts - INTERVAL 1 HOUR AS t, 1 AS kind,
         CAST(0 AS BIGINT) AS island,
         CAST(NULL AS VARCHAR) AS type_then,
         event_type AS type_now
  FROM events
),
merged AS (
  SELECT kind, type_now,
         last_value(type_then IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t, kind, island
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS carried
  FROM (SELECT * FROM dimrows UNION ALL SELECT * FROM factrows)
)
SELECT type_now,
       coalesce(carried, 'none') AS type_then,
       CAST(count(*) AS BIGINT) AS n_events
FROM merged WHERE kind = 1
GROUP BY type_now, coalesce(carried, 'none')
"""


@register("scd2_asof_lookup", sql=_SCD2_LOOKUP_SQL)
def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("user_id", "island").agg(
        F.min("event_type").alias("type_then"),
        F.min("ts").alias("valid_from"),
    )
    # MERGE lookup instead of hash-join + range residual: union the
    # version-start rows with the facts, sort once per user, and carry
    # the last version forward. Per-key work is O(spans + facts) —
    # linear — where the hash-join probe was O(spans × facts) and
    # quadratic on high-churn keys (measured: the sf1.0 bot users
    # dominated wall time under the join formulation). Dim rows sort
    # before facts at equal t (kind 0 < 1), and same-instant spans
    # resolve by island order, so ties match the range semantics.
    dimrows = spans.select(
        "user_id",
        F.col("valid_from").alias("t"),
        F.lit(0).alias("kind"),
        "island",
        "type_then",
        F.lit(None).cast("string").alias("type_now"),
    )
    factrows = T(spark, sf_dir, "events").select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("t"),
        F.lit(1).alias("kind"),
        F.lit(0).cast("long").alias("island"),
        F.lit(None).cast("string").alias("type_then"),
        F.col("event_type").alias("type_now"),
    )
    wm = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", "island")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = dimrows.unionByName(factrows).select(
        "kind",
        "type_now",
        F.last("type_then", ignorenulls=True).over(wm).alias("carried"),
    )
    return (
        merged.filter(F.col("kind") == 1)
        .groupBy(
            "type_now",
            F.coalesce("carried", F.lit("none")).alias("type_then"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# cdc_net_changes — batch changelog compaction (the Debezium/Delta-CDF
# "net effect" rule): a batch of per-key insert/update/delete rows
# collapses to ONE net operation per key decided by the (first_op,
# last_op) pair — I..D cancels to NONE, I..x stays an INSERT carrying
# the LAST value, x..D nets to DELETE, anything else is an UPDATE.
# This is the compaction every incremental consumer (including the
# repo's IVM maintainers) wants applied to a changelog before replay:
# N ops per key become 1. Ops are synthesized deterministically from
# event_id (both engines identically); per-key first/last are
# arg_min/arg_max over the total (ts, event_id) order — ONE hash
# aggregate over the batch, no window, no sort of the full changelog.
# Output is the |op|-grain summary: keys per net op and the exact
# DECIMAL sum of surviving last-values.
# ---------------------------------------------------------------------------

_CDC_NET_SQL = """
WITH log AS (
  SELECT user_id AS k, ts, event_id,
         CASE WHEN event_id % 10 = 0 THEN 'D'
              WHEN event_id % 10 <= 2 THEN 'I'
              ELSE 'U' END AS op,
         CAST(round(CAST(value AS DOUBLE), 2) AS DECIMAL(12,2)) AS v
  FROM events
),
ordered AS (
  SELECT k, op, v, n_ops_one,
         strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
  FROM (SELECT *, 1 AS n_ops_one FROM log)
),
per_key AS (
  SELECT k,
         arg_min(op, ord_key) AS first_op,
         arg_max(op, ord_key) AS last_op,
         arg_max(v, ord_key)  AS last_v,
         count(*) AS n_ops
  FROM ordered GROUP BY k
),
net AS (
  SELECT k, n_ops, last_v,
         CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'NONE'
              WHEN first_op = 'I'                   THEN 'I'
              WHEN last_op = 'D'                    THEN 'D'
              ELSE 'U' END AS net_op
  FROM per_key
)
SELECT net_op,
       CAST(count(*) AS BIGINT)  AS n_keys,
       CAST(sum(n_ops) AS BIGINT) AS n_ops_compacted,
       CAST(round(sum(CASE WHEN net_op IN ('I', 'U') THEN last_v END), 2)
            AS DOUBLE) AS net_value_sum
FROM net GROUP BY net_op
"""


@register("cdc_net_changes", sql=_CDC_NET_SQL)
def cdc_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = T(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        "ts",
        "event_id",
        F.when(F.col("event_id") % 10 == 0, "D")
        .when(F.col("event_id") % 10 <= 2, "I")
        .otherwise("U")
        .alias("op"),
        F.round(F.col("value").cast("double"), 2)
        .cast("decimal(12,2)")
        .alias("v"),
    )
    # DuckDB's arg_min/arg_max take scalar ordering keys only, so both
    # engines order by the SAME lexicographic (strftime ts, zero-padded
    # event_id) string — string order == chronological order.
    ord_key = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    per_key = log.groupBy("k").agg(
        F.min_by("op", ord_key).alias("first_op"),
        F.max_by("op", ord_key).alias("last_op"),
        F.max_by("v", ord_key).alias("last_v"),
        F.count(F.lit(1)).alias("n_ops"),
    )
    net = per_key.select(
        "k",
        "n_ops",
        "last_v",
        F.when(
            (F.col("first_op") == "I") & (F.col("last_op") == "D"), "NONE"
        )
        .when(F.col("first_op") == "I", "I")
        .when(F.col("last_op") == "D", "D")
        .otherwise("U")
        .alias("net_op"),
    )
    return net.groupBy("net_op").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n_ops").cast("long").alias("n_ops_compacted"),
        F.round(
            F.sum(
                F.when(F.col("net_op").isin("I", "U"), F.col("last_v"))
            ),
            2,
        )
        .cast("double")
        .alias("net_value_sum"),
    )


# ---------------------------------------------------------------------------
# events_trend_test — nonparametric monotonic-trend detection over the
# daily event-count series: the Mann-Kendall S statistic with the full
# tie-corrected variance, its z-score, the 5% two-sided verdict, and
# the Theil-Sen slope (median of all pairwise slopes) — the
# trend-alarm kit a monitoring pipeline runs on every metric series
# because it needs no distributional assumptions and shrugs off
# outliers that wreck least-squares.
#
# Scale shape: everything reduces through the DAILY grain first
# (calendar-bounded — |days| per type, never |events|), so the
# pairwise self-join is days^2/2 per type — thousands of rows when the
# corpus is petabytes. S and the tie correction are exact integers;
# the only floats are the final row-local z and the pairwise slopes,
# whose median is picked by INTEGER rank over a (slope, day, day)
# total order, so both engines select the identical element(s).
# ---------------------------------------------------------------------------

_TREND_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, day
),
pairs AS (
  SELECT a.event_type,
         CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn,
         CAST(b.c - a.c AS DOUBLE)
           / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope,
         a.day AS d1, b.day AS d2
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
),
mk AS (
  SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat
  FROM pairs GROUP BY event_type
),
nd AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily
  GROUP BY event_type
),
ties AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
        FROM daily GROUP BY event_type, c)
  GROUP BY event_type
),
ranked AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope, d1, d2) AS rn,
         count(*) OVER (PARTITION BY event_type) AS np
  FROM pairs
),
sen AS (
  SELECT event_type, avg(slope) AS sen_slope
  FROM ranked
  WHERE rn = (np + 1) // 2 OR rn = (np + 2) // 2
  GROUP BY event_type
),
z AS (
  SELECT mk.event_type, mk.s_stat, nd.n_days, ties.tie_term,
         (CAST(nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
               - ties.tie_term AS DOUBLE)) / 18.0 AS var_s
  FROM mk JOIN nd ON mk.event_type = nd.event_type
          JOIN ties ON mk.event_type = ties.event_type
)
SELECT z.event_type, z.n_days, z.s_stat,
       round(z.var_s, 6) AS var_s,
       round(CASE WHEN z.s_stat > 0
                  THEN CAST(z.s_stat - 1 AS DOUBLE) / nullif(sqrt(z.var_s), 0)
                  WHEN z.s_stat < 0
                  THEN CAST(z.s_stat + 1 AS DOUBLE) / nullif(sqrt(z.var_s), 0)
                  ELSE 0.0 END, 6) AS z_score,
       CASE WHEN z.s_stat > 0
                 AND CAST(z.s_stat - 1 AS DOUBLE)
                     / nullif(sqrt(z.var_s), 0) > 1.96 THEN 'increasing'
            WHEN z.s_stat < 0
                 AND CAST(z.s_stat + 1 AS DOUBLE)
                     / nullif(sqrt(z.var_s), 0) < -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend,
       round(sen.sen_slope, 6) AS sen_slope
FROM z JOIN sen ON z.event_type = sen.event_type
"""


@register("events_trend_test", sql=_TREND_SQL)
def events_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    # the fact-grain reduction runs ONCE: every downstream branch (the
    # pairwise join, n_days, the tie correction) reads the checkpointed
    # calendar-bounded daily frame, not the raw events scan
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.when(F.col("b.c") > F.col("a.c"), 1)
        .when(F.col("b.c") < F.col("a.c"), -1)
        .otherwise(0)
        .alias("sgn"),
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / F.datediff(F.col("b.day"), F.col("a.day")).cast("double")
        ).alias("slope"),
        F.col("a.day").alias("d1"),
        F.col("b.day").alias("d2"),
    )
    mk = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("s_stat")
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("np"),
    )
    sen = (
        ranked.filter(
            (F.col("rn") == F.expr("(np + 1) div 2"))
            | (F.col("rn") == F.expr("(np + 2) div 2"))
        )
        .groupBy("event_type")
        .agg(F.avg("slope").alias("sen_slope"))
    )
    z = (
        mk.join(nd, "event_type")
        .join(ties, "event_type")
        .withColumn(
            "var_s",
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.col("tie_term")
            ).cast("double")
            / 18.0,
        )
    )
    sqrt_v = F.nullif(F.sqrt("var_s"), F.lit(0.0))
    z_expr = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / sqrt_v,
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double") / sqrt_v,
        )
        .otherwise(F.lit(0.0))
    )
    return z.join(sen, "event_type").select(
        "event_type",
        "n_days",
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.round(z_expr, 6).alias("z_score"),
        F.when(
            (F.col("s_stat") > 0)
            & ((F.col("s_stat") - 1).cast("double") / sqrt_v > 1.96),
            "increasing",
        )
        .when(
            (F.col("s_stat") < 0)
            & ((F.col("s_stat") + 1).cast("double") / sqrt_v < -1.96),
            "decreasing",
        )
        .otherwise("no_trend")
        .alias("trend"),
        F.round("sen_slope", 6).alias("sen_slope"),
    )


# ---------------------------------------------------------------------------
# events_top_paths — top user journeys: each user's first three event
# types (in time order) form a path string; output the 10 most common
# paths among users with >= 3 events. The complement of events_markov
# (which models single transitions): this surfaces whole entry
# journeys, the product-analytics artifact behind onboarding funnels.
#
# Scale shape: the only window partitions per USER and the
# WindowGroupLimit pushdown caps it at 3 rows per user before the
# shuffle-side sort buffers anything; paths then collapse to the
# path-string grain and the top-10 is a TakeOrdered heap.
# ---------------------------------------------------------------------------

_TOP_PATHS_SQL = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id,
         string_agg(event_type, ' > ' ORDER BY rn) AS path,
         count(*) AS n
  FROM ranked WHERE rn <= 3
  GROUP BY user_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_users
FROM paths WHERE n = 3
GROUP BY path
ORDER BY n_users DESC, path
LIMIT 10
"""


@register("events_top_paths", sql=_TOP_PATHS_SQL)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda r: r["event_type"],
            ),
            " > ",
        ).alias("path"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        paths.filter(F.col("n") == 3)
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# events_watermark_profile — the out-of-orderness audit that PICKS a
# streaming watermark: treating event_id as arrival order, an event is
# late by (max event-time already arrived for this user - its own
# event-time). The lateness distribution lands in fixed buckets
# (in-order, <=1 s, <=10 s, <=60 s, <=5 min, <=30 min, beyond) with
# cumulative coverage per bucket; the smallest bucket whose coverage
# reaches 99% is the watermark delay the streaming jobs
# (streaming/events.py) should configure. Closes the batch->streaming
# loop the way the eval queries close their tuning loops.
#
# Scale shape: the running max windows per USER over arrival order
# (bounded per-user state, the same partitioning every per-user window
# here uses); lateness is exact integer microseconds; the histogram
# and its cumulative window live on the 7-row bucket grain.
# ---------------------------------------------------------------------------

_WM_SQL = """
WITH arr AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         event_id // 100000 AS seg
  FROM events
),
seg_max AS (
  SELECT user_id, seg, max(ts_us) AS m FROM arr GROUP BY user_id, seg
),
carry AS (
  SELECT user_id, seg,
         max(m) OVER (PARTITION BY user_id ORDER BY seg
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prior_max
  FROM seg_max
),
late AS (
  -- ts_us is strictly positive, so 0 is a safe "no prior event"
  -- sentinel: it can never win greatest() against a real prefix max
  -- and never overflows the subtraction
  SELECT greatest(
           greatest(
             coalesce(max(a.ts_us) OVER (
               PARTITION BY a.user_id, a.seg ORDER BY a.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
             coalesce(c.prior_max, 0)
           ) - a.ts_us,
           0) AS late_us
  FROM arr a JOIN carry c ON a.user_id = c.user_id AND a.seg = c.seg
),
bucketed AS (
  SELECT CASE WHEN late_us IS NULL OR late_us = 0 THEN 0
              WHEN late_us <= 1000000 THEN 1
              WHEN late_us <= 10000000 THEN 2
              WHEN late_us <= 60000000 THEN 3
              WHEN late_us <= 300000000 THEN 4
              WHEN late_us <= 1800000000 THEN 5
              ELSE 6 END AS b
  FROM late
),
hist AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n_events FROM bucketed GROUP BY b
)
SELECT CASE b WHEN 0 THEN 'in_order' WHEN 1 THEN 'le_1s'
              WHEN 2 THEN 'le_10s' WHEN 3 THEN 'le_60s'
              WHEN 4 THEN 'le_5min' WHEN 5 THEN 'le_30min'
              ELSE 'gt_30min' END AS lateness,
       n_events,
       round(CAST(sum(n_events) OVER (ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) / sum(n_events) OVER (), 6) AS cum_share,
       CAST(sum(n_events) OVER (ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            >= CAST(ceil(0.99 * sum(n_events) OVER ()) AS BIGINT)
            AS BOOLEAN) AS covers_p99
FROM hist
"""


@register("events_watermark_profile", sql=_WM_SQL)
def events_watermark_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    # per-key state must stay bounded even for a bot whose whole
    # history lands on one user (the events_ewma lesson): the arrival
    # prefix-max decomposes over fixed 100k-event_id segments — an
    # in-segment window (<= 100k rows per task by construction) plus a
    # cross-segment carry window on the (user, segment) grain
    arr = ev.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.expr("event_id div 100000").alias("seg"),
    ).localCheckpoint(eager=False)
    seg_max = arr.groupBy("user_id", "seg").agg(
        F.max("ts_us").alias("m")
    )
    wseg = (
        Window.partitionBy("user_id")
        .orderBy("seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = seg_max.select(
        "user_id", "seg", F.max("m").over(wseg).alias("prior_max")
    )
    win = (
        Window.partitionBy("user_id", "seg")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = arr.join(carry, ["user_id", "seg"]).select(
        F.greatest(
            F.greatest(
                F.coalesce(F.max("ts_us").over(win), F.lit(0)),
                F.coalesce("prior_max", F.lit(0)),
            )
            - F.col("ts_us"),
            F.lit(0),
        ).alias("late_us")
    )
    bucketed = late.select(
        F.when(
            F.col("late_us").isNull() | (F.col("late_us") == 0), 0
        )
        .when(F.col("late_us") <= 1_000_000, 1)
        .when(F.col("late_us") <= 10_000_000, 2)
        .when(F.col("late_us") <= 60_000_000, 3)
        .when(F.col("late_us") <= 300_000_000, 4)
        .when(F.col("late_us") <= 1_800_000_000, 5)
        .otherwise(6)
        .alias("b")
    )
    hist = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    labels = {
        0: "in_order", 1: "le_1s", 2: "le_10s", 3: "le_60s",
        4: "le_5min", 5: "le_30min", 6: "gt_30min",
    }
    label = F.col("b")
    expr = F.lit("gt_30min")
    for k in sorted(labels, reverse=True)[1:]:
        expr = F.when(label == k, labels[k]).otherwise(expr)
    return hist.select(
        expr.alias("lateness"),
        "n_events",
        F.round(
            F.sum("n_events").over(wb).cast("double")
            / F.sum("n_events").over(wall),
            6,
        ).alias("cum_share"),
        (
            F.sum("n_events").over(wb)
            >= F.ceil(0.99 * F.sum("n_events").over(wall)).cast("long")
        ).alias("covers_p99"),
    )
