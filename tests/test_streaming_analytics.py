"""Streaming analytics: watermarked windowed rollups, session windows, and
the custom applyInPandasWithState operator — exercised through real
Structured Streaming runs (file source, availableNow, memory sink)."""

from __future__ import annotations

import datetime as dt
import os

from nixiesearch_spark.streaming.analytics import (
    running_user_stats,
    sessionized,
    windowed_rollup,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, h, m), u, et, v) for i, (h, m, u, et, v) in enumerate(rows)],
        SCHEMA,
    )


def test_windowed_rollup_batch(spark):
    ev = _events(spark, [
        (9, 30, 1, "click", 1.0), (9, 45, 2, "click", 2.0),
        (10, 15, 1, "view", 5.0), (11, 5, 3, "click", 0.5),
    ])
    got = {(r["window_start"].hour, r["event_type"]): (r["cnt"], r["value_sum"])
           for r in windowed_rollup(ev).collect()}
    assert got[(9, "click")] == (2, 3.0)
    assert got[(10, "view")] == (1, 5.0)
    assert got[(11, "click")] == (1, 0.5)


def test_sessionized_batch(spark):
    ev = _events(spark, [
        (9, 0, 1, "a", 1.0), (9, 10, 1, "a", 1.0), (9, 50, 1, "a", 1.0),  # gap>30m at 9:10→9:50
        (9, 0, 2, "a", 2.0),
    ])
    rows = sorted(sessionized(ev, gap="30 minutes").collect(),
                  key=lambda r: (r["user_id"], r["session_start"]))
    assert [(r["user_id"], r["n_events"]) for r in rows] == [(1, 2), (1, 1), (2, 1)]
    # session extends gap past the last event
    assert rows[0]["session_end"] == dt.datetime(2024, 1, 1, 9, 40)


def test_windowed_rollup_stream_drops_late(spark, tmp_path):
    in_dir, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    os.makedirs(in_dir)

    def run(name):
        stream = (spark.readStream.schema(SCHEMA)
                  .option("recursiveFileLookup", "true").parquet(in_dir))
        got = []

        def sink(batch_df, batch_id):
            got.extend(batch_df.collect())

        q = (
            windowed_rollup(stream, window="1 hour", watermark="1 hour")
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r["window_start"].hour, r["event_type"]): r["cnt"] for r in got}

    _events(spark, [
        (9, 30, 1, "click", 1.0), (10, 30, 1, "click", 1.0),
        (11, 30, 1, "click", 1.0), (12, 0, 1, "click", 1.0),
    ]).write.parquet(os.path.join(in_dir, "b1"))
    out1 = run("wr1")
    # availableNow runs a final flush batch: watermark 12:00-1h = 11:00 →
    # windows 9 and 10 are closed and emitted within run 1
    assert out1 == {(9, "click"): 1, (10, "click"): 1}

    # batch 2: one LATE event (9:45, behind the checkpointed 11:00
    # watermark) + one new event (13:30)
    _events(spark, [(9, 45, 2, "click", 1.0), (13, 30, 1, "click", 1.0)]).write.mode(
        "append"
    ).parquet(os.path.join(in_dir, "b2"))
    out2 = run("wr2")
    # the late event is DROPPED: window 9 (already emitted and closed) is
    # NOT re-emitted with the extra count; watermark 12:30 closes window 11
    # (window 12 ends 13:00 > watermark — still open)
    assert (9, "click") not in out2
    assert out2 == {(11, "click"): 1}


def test_running_user_stats_stateful(spark, tmp_path):
    in_dir, cp = str(tmp_path / "in"), str(tmp_path / "cp")
    os.makedirs(in_dir)

    def run(name):
        stream = (spark.readStream.schema(SCHEMA)
                  .option("recursiveFileLookup", "true").parquet(in_dir))
        got = []

        def sink(batch_df, batch_id):
            got.extend(batch_df.collect())

        q = (
            running_user_stats(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    _events(spark, [(9, 0, 1, "a", 1.0), (9, 5, 1, "a", 2.0), (9, 0, 2, "a", 5.0)]).write.parquet(
        os.path.join(in_dir, "b1")
    )
    out1 = {r["user_id"]: (r["cnt"], r["vsum"]) for r in run("rs1")}
    assert out1 == {1: (2, 3.0), 2: (1, 5.0)}

    # second batch: state carries across the restart via the checkpoint
    _events(spark, [(10, 0, 1, "a", 4.0)]).write.mode("append").parquet(
        os.path.join(in_dir, "b2")
    )
    out2 = {r["user_id"]: (r["cnt"], r["vsum"]) for r in run("rs2")}
    assert out2[1] == (3, 7.0)  # cumulative across batches
    assert 2 not in out2  # no update for user 2 this batch


def test_streaming_ops_work_on_testdata(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n = windowed_rollup(ev).count()
    assert n > 0
    s = sessionized(ev, gap="10 minutes")
    assert s.count() > 0
