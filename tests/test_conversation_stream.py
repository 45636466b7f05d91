"""Streaming conversation profiles: the applyInPandasWithState running
profile accumulates across micro-batches (turns of one conversation
split over two files) and its final per-conversation rows equal the
batch `conversation_stats` aggregate on the union."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators import conversations as CONV
from entity_linking_spark.sources.transcripts import synth_transcripts
from entity_linking_spark.streaming.conversation_stream import (
    conversation_running_stats,
)


def _land(df, base, input_dir, name):
    staging = str(base / f"_staging_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(input_dir, f"{name}.parquet"))
    shutil.rmtree(staging)


@pytest.fixture(scope="module")
def landed_transcripts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("convstream")
    input_dir = str(base / "input")
    os.makedirs(input_dir)
    tdf, _ = synth_transcripts(spark, n_convs=30, n_entities=8, seed=11)
    # split by turn parity: most conversations straddle BOTH micro-batches,
    # so correct profiles REQUIRE state surviving the batch boundary
    _land(tdf.filter(F.col("turn_idx") % 2 == 0), base, input_dir, "a")
    _land(tdf.filter(F.col("turn_idx") % 2 != 0), base, input_dir, "b")
    return input_dir, tdf, base


def test_streaming_profiles_accumulate_to_batch_stats(spark, landed_transcripts):
    input_dir, tdf, base = landed_transcripts
    stream = (
        spark.readStream.schema(tdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        conversation_running_stats(stream)
        .writeStream.format("memory")
        .queryName("conv_stream")
        .outputMode("update")
        .option("checkpointLocation", str(base / "ckpt_conv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("conv_stream")
    assert got.filter(F.col("final") == "live").count() > 0
    # last live row per conversation = the accumulated profile
    final = got.groupBy("conv_id").agg(
        F.max("n_turns").alias("n_turns"),
        F.max("n_user_turns").alias("n_user_turns"),
        F.max("n_assistant_turns").alias("n_assistant_turns"),
        F.max("n_tool_calls").alias("n_tool_calls"),
        F.min("first_us").alias("first_us"),
        F.max("last_us").alias("last_us"),
        F.max("total_chars").alias("total_chars"),
    )
    want = CONV.conversation_stats(tdf).select(
        "conv_id",
        "n_turns",
        "n_user_turns",
        "n_assistant_turns",
        "n_tool_calls",
        F.unix_micros(F.col("first_ts").cast("timestamp")).alias("first_us"),
        F.unix_micros(F.col("last_ts").cast("timestamp")).alias("last_us"),
        "total_chars",
    )
    assert final.count() == want.count() == 30
    assert final.exceptAll(want).count() == 0
    assert want.exceptAll(final).count() == 0
