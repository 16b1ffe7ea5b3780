"""Streaming/batch parity: the Structured Streaming jobs must produce the
same results as their batch twins on the same files."""

from __future__ import annotations

from codex_data_products_spark.queries.events import events_tumbling_window
from codex_data_products_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    tumbling_counts,
)


def test_tumbling_stream_matches_batch(spark, sf_dir):
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "tumbling_test", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in events_tumbling_window(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_sessionize_stream_closes_sessions(spark, sf_dir):
    from codex_data_products_spark.queries.windows import sessionize
    from codex_data_products_spark.streaming.events import sessionize_stream

    stream = sessionize_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "sessions_test", output_mode="append")
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["session_end"])
        for r in spark.sql("SELECT * FROM sessions_test").collect()
    }
    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["session_end"])
        for r in sessionize(spark, sf_dir).collect()
    }
    # The stream emits only *closed* sessions (the open tail per user
    # stays in state until timeout); every emitted session must match the
    # batch result exactly, and all but at most one session per user must
    # have been emitted.
    assert got, "stream emitted no sessions"
    for key, val in got.items():
        assert batch[key] == val
    n_users = len({u for u, _ in batch})
    assert len(got) >= len(batch) - n_users


def test_anomaly_stream_single_batch_matches_batch(spark, sf_dir):
    from codex_data_products_spark.queries.events import events_anomaly
    from codex_data_products_spark.streaming.events import anomaly_stream

    stream = anomaly_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "anomaly_test", output_mode="append")
    got = {
        r["event_id"]: (r["event_type"], r["value"], r["zscore"])
        for r in spark.sql("SELECT * FROM anomaly_test").collect()
    }
    want = {
        r["event_id"]: (r["event_type"], r["value"], r["zscore"])
        for r in events_anomaly(spark, sf_dir).collect()
    }
    assert len(got) > 0
    assert got == want


def test_attribution_stream_stream_join_matches_batch(spark, sf_dir):
    from codex_data_products_spark.queries.events import events_attribution
    from codex_data_products_spark.streaming.events import attribution_stream

    stream = attribution_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "attribution_test", output_mode="append")
    got = {
        (r["purchase_id"], r["view_id"], r["user_id"], r["lag_us"])
        for r in spark.sql("SELECT * FROM attribution_test").collect()
    }
    want = {
        (r["purchase_id"], r["view_id"], r["user_id"], r["lag_us"])
        for r in events_attribution(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_enrich_stream_static_join_matches_batch(spark, sf_dir):
    from codex_data_products_spark.streaming.events import (
        enrich_stream,
        user_profile_frame,
    )
    from codex_data_products_spark.tables import table as T

    batch_events = T(spark, sf_dir, "events")
    profile = user_profile_frame(batch_events)
    stream = enrich_stream(read_events_stream(spark, sf_dir), profile)
    run_to_memory(stream, "enrich_test", output_mode="append")
    got = {
        (r["event_id"], r["user_id"], r["value"], r["mean_value"])
        for r in spark.sql("SELECT * FROM enrich_test").collect()
    }
    from pyspark.sql import functions as F

    want = {
        (r["event_id"], r["user_id"], r["value"], r["mean_value"])
        for r in batch_events.join(profile, "user_id")
        .filter(F.col("value") > 2 * F.col("mean_value"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_cms_equals_batch_sketch(spark, sf_dir):
    """The incrementally-maintained sketch must be cell-for-cell equal
    to the batch-built one over the same files — sketch maintenance is
    a running aggregation, so streaming it is exact, not approximate."""
    from pyspark.sql import functions as F

    from codex_data_products_spark.operators.sketches import cms_build
    from codex_data_products_spark.streaming.events import cms_stream
    from codex_data_products_spark.tables import table as T

    stream_items = read_events_stream(spark, sf_dir).select(
        F.col("event_type").alias("item")
    )
    run_to_memory(
        cms_stream(stream_items, "item"), "cms_test", output_mode="complete"
    )
    got = {
        (r["d"], r["cell"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_test").collect()
    }
    batch_items = T(spark, sf_dir, "events").select(
        F.col("event_type").alias("item")
    )
    want = {
        (r["d"], r["cell"]): r["cnt"]
        for r in cms_build(batch_items, "item").collect()
    }
    assert got == want and len(got) > 0


def test_scd2_stream_matches_batch_closed_intervals(spark, sf_dir):
    from codex_data_products_spark.queries.events import events_scd2
    from codex_data_products_spark.streaming.events import scd2_stream

    stream = scd2_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "scd2_test", output_mode="append")
    got = {
        (r["user_id"], r["valid_from"]): (
            r["event_type"],
            r["valid_to"],
            r["n_events"],
        )
        for r in spark.sql("SELECT * FROM scd2_test").collect()
    }
    # the stream appends exactly the CLOSED intervals; the open tail per
    # user stays in state (batch marks it is_current)
    batch = {
        (r["user_id"], r["valid_from"]): (
            r["event_type"],
            r["valid_to"],
            r["n_events"],
        )
        for r in events_scd2(spark, sf_dir).filter("NOT is_current").collect()
    }
    assert got == batch
