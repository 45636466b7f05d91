"""Streaming event-time analytics: the watermarked session-window
stream matches the batch twin on the same landed files, and the
applyInPandasWithState running totals accumulate across micro-batches
and match a batch aggregate."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.streaming.event_stream import (
    session_counts,
    user_running_totals,
)


def _land(df, base, input_dir, name):
    staging = str(base / f"_staging_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(input_dir, f"{name}.parquet"))
    shutil.rmtree(staging)


@pytest.fixture(scope="module")
def landed_events(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("evstream")
    input_dir = str(base / "input")
    os.makedirs(input_dir)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # two files -> two micro-batches under maxFilesPerTrigger=1
    _land(ev.filter(F.hash("event_id") % 2 == 0), base, input_dir, "a")
    _land(ev.filter(F.hash("event_id") % 2 != 0), base, input_dir, "b")
    return input_dir, ev, base


def _read_stream(spark, input_dir, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def test_streaming_session_counts_match_batch(spark, landed_events):
    input_dir, ev, base = landed_events
    stream = _read_stream(spark, input_dir, ev.schema)
    # complete mode: every (still-open and closed) session emits each
    # trigger, so the final memory-sink table is the full answer
    q = (
        session_counts(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(base / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("sess_stream")
    want = session_counts(ev)  # same operator, batch source
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # sanity vs the lag-based batch sessionize: same session count per
    # user (fixture gaps never land exactly on the boundary)
    from entity_linking_spark.operators.events import sessionize

    lag_sessions = sessionize(ev).groupBy("user_id").count()
    win_sessions = want.groupBy("user_id").count()
    diff = lag_sessions.join(win_sessions, "user_id").filter(
        lag_sessions["count"] != win_sessions["count"]
    )
    assert diff.count() == 0


def test_stateful_running_totals_accumulate(spark, landed_events):
    input_dir, ev, base = landed_events
    stream = _read_stream(spark, input_dir, ev.schema)
    q = (
        user_running_totals(stream)
        .writeStream.format("memory")
        .queryName("totals_stream")
        .outputMode("update")
        .option("checkpointLocation", str(base / "ckpt_tot"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("totals_stream")
    # update mode emits one row per user per micro-batch it appears in;
    # the LAST row per user carries the accumulated totals across both
    # batches — state survived the micro-batch boundary
    assert got.filter(F.col("final") == "live").count() > 0
    final = (
        got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    want = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.coalesce("value", F.lit(0.0))).alias("total_value"),
    )
    j = final.join(want, "user_id", "full").filter(
        (final["n_events"] != want["n_events"])
        | (F.abs(final["total_value"] - want["total_value"]) > 1e-6)
    )
    assert j.count() == 0
    assert final.count() == want.count()
