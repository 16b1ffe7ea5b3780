"""Watermark semantics: late data is dropped, dedup state is bounded.

These tests drive *incremental* runs: two availableNow executions
sharing one checkpoint, with new files landing between them — the
file-source equivalent of a continuously running job seeing a late
arrival after the watermark has advanced.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from codex_data_products_spark.streaming.events import (
    dedup_events_stream,
    sliding_counts,
    tumbling_counts,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T0 = dt.datetime(2026, 1, 1, 10, 0, 0)


def _write_batch(spark, path, rows, part):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("append").parquet(f"{path}/b{part}")


def _stream(spark, path):
    return spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(path)


def _run(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _ev(eid, minutes, etype="click", value=1.0, uid=1):
    return (eid, T0 + dt.timedelta(minutes=minutes), uid, etype, value)


def test_late_rows_are_dropped_after_watermark(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # run 1: one event at 10:15 and one at 13:30 → watermark after the
    # batch = 13:30 - 2h = 11:30, so window [10:00,11:00) closes and is
    # emitted (append mode emits only closed windows)
    _write_batch(spark, src, [_ev(1, 15), _ev(2, 210)], 1)
    _run(tumbling_counts(_stream(spark, src), watermark="2 hours"), out, ckpt)

    # run 2: a LATE event back at 10:20 (window already closed) plus a
    # fresh one at 14:00 — the late row must be dropped, not re-open the
    # closed window
    _write_batch(spark, src, [_ev(3, 20), _ev(4, 240)], 2)
    _run(tumbling_counts(_stream(spark, src), watermark="2 hours"), out, ckpt)

    rows = spark.read.parquet(out).collect()
    by_window = {}
    for r in rows:
        by_window.setdefault(r["window_start"], []).append(r["n_events"])
    # closed window emitted exactly once, counting only the on-time event
    assert by_window["2026-01-01 10:00:00"] == [1]


def test_sliding_stream_matches_batch_shape(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _write_batch(
        spark, src, [_ev(1, 10), _ev(2, 40), _ev(3, 70), _ev(4, 500)], 1
    )
    _run(sliding_counts(_stream(spark, src), watermark="1 hour"), out, ckpt)
    got = {
        r["window_start"]: r["n_events"] for r in spark.read.parquet(out).collect()
    }
    # events at 10:10/10:40/11:10; closed 1h-wide windows sliding 30min:
    # [09:30): {10:10}=1, [10:00): {10:10,10:40}=2, [10:30): {10:40,11:10}=2,
    # [11:00): {11:10}=1
    assert got["2026-01-01 09:30:00"] == 1
    assert got["2026-01-01 10:00:00"] == 2
    assert got["2026-01-01 10:30:00"] == 2
    assert got["2026-01-01 11:00:00"] == 1


def test_stream_dedup_within_watermark(spark, tmp_path):
    src, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # same event_id arrives three times within the watermark window
    _write_batch(
        spark,
        src,
        [_ev(1, 0), _ev(1, 1), _ev(2, 2)],
        1,
    )
    _run(dedup_events_stream(_stream(spark, src), watermark="2 hours"), out, ckpt)
    _write_batch(spark, src, [_ev(1, 3), _ev(3, 4)], 2)
    _run(dedup_events_stream(_stream(spark, src), watermark="2 hours"), out, ckpt)

    got = (
        spark.read.parquet(out)
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = {r["event_id"]: r["n"] for r in got}
    assert counts == {1: 1, 2: 1, 3: 1}


def test_scd2_stream_closes_intervals_across_incremental_runs(spark, tmp_path):
    from codex_data_products_spark.streaming.events import scd2_stream

    src, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # run 1: user 1 is in 'view' state (two events) — nothing closes
    _write_batch(
        spark,
        src,
        [_ev(1, 0, "view"), _ev(2, 10, "view")],
        1,
    )
    _run(scd2_stream(_stream(spark, src)), out, ckpt)
    assert spark.read.schema(
        "user_id long, event_type string, valid_from string, "
        "valid_to string, n_events long"
    ).parquet(out).count() == 0

    # run 2: a 'purchase' arrives → the open 'view' interval closes with
    # valid_to = the change timestamp, carried ACROSS the restart via
    # checkpointed state
    _write_batch(spark, src, [_ev(3, 25, "purchase")], 2)
    _run(scd2_stream(_stream(spark, src)), out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["event_type"], r["n_events"]) == (1, "view", 2)
    assert r["valid_from"].startswith("2026-01-01 10:00:00")
    assert r["valid_to"].startswith("2026-01-01 10:25:00")


def test_scd2_buffered_reorders_late_cross_batch_event(spark, tmp_path):
    """The buffered SCD-2 slots an in-watermark event that arrives in a
    LATER micro-batch into its true timeline position: user 7's type-C
    event at 10:45 arrives after the 11:00 type-B event was already
    seen, yet the closed intervals come out in true ts order —
    exactly what the unbuffered scd2_stream cannot guarantee (its
    documented ordered-arrival assumption)."""
    from datetime import datetime

    from codex_data_products_spark.streaming.events import (
        scd2_stream_buffered,
    )

    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/{name}"
        )

    t = lambda s: datetime.fromisoformat(f"2024-01-01 {s}")  # noqa: E731

    def drain():
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(src)
        (
            scd2_stream_buffered(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    # drain 1 — in-order prefix for user 7 plus a sentinel user 99
    # event whose time drives the watermark to 10:30 for the next batch
    write_file(
        "f1",
        [
            (1, t("10:00:00"), 7, "A"),
            (2, t("10:30:00"), 7, "A"),
            (3, t("11:00:00"), 7, "B"),
            (90, t("12:30:00"), 99, "Z"),
        ],
    )
    drain()
    # drain 2 — the LATE event: ts 10:45, one whole batch AFTER the
    # 11:00 row, but still inside the 2h watermark delay (wm = 10:30);
    # the sentinel pushes the next watermark to 11:30
    write_file(
        "f2",
        [(4, t("10:45:00"), 7, "C"), (91, t("13:30:00"), 99, "Z")],
    )
    drain()
    # drain 3 — no new user-7 data: the event-time timeout re-invokes
    # the group once wm (11:30) passes its buffered rows, maturing C@10:45
    # and B@11:00 in true ts order
    write_file("f3", [(92, t("13:31:00"), 99, "Z")])
    drain()
    got = {
        (r["user_id"], r["valid_from"]): (
            r["event_type"],
            r["valid_to"],
            r["n_events"],
        )
        for r in spark.read.parquet(out).collect()
    }
    # true timeline for user 7: A@10:00, A@10:30, C@10:45, B@11:00
    want = {
        (7, "2024-01-01 10:00:00.000000"): (
            "A",
            "2024-01-01 10:45:00.000000",
            2,
        ),
        (7, "2024-01-01 10:45:00.000000"): (
            "C",
            "2024-01-01 11:00:00.000000",
            1,
        ),
    }
    assert got == want  # B stays open in state; sentinel user 99 too
