"""As-of join: hand-checked boundary semantics (no prior row → null,
right row exactly AT the left timestamp matches, greatest tiebreak wins
among same-timestamp right rows) and the single-shuffle plan contract —
the scalable union-scan form, not a range join."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from entity_linking_spark.operators.asof import asof_join

UTC = datetime.timezone.utc


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour, tzinfo=UTC)


def test_asof_join_boundaries(spark):
    right = spark.createDataFrame(
        [
            (1, _ts(10), 100, 5.0),
            (1, _ts(10), 101, 6.0),  # same ts, higher tiebreak → wins
            (1, _ts(20), 102, 7.0),
            (2, _ts(15), 200, 9.0),
        ],
        "k long, rts timestamp, rid long, v double",
    )
    left = spark.createDataFrame(
        [
            (1, _ts(5), "before-any"),      # no prior row → nulls
            (1, _ts(10), "exactly-at"),      # row AT ts matches; rid 101 wins
            (1, _ts(12), "between"),         # still rid 101
            (1, _ts(20), "second-exact"),    # rid 102
            (1, _ts(25), "after-all"),       # rid 102
            (2, _ts(16), "other-key"),       # rid 200, never key 1's rows
            (3, _ts(16), "unknown-key"),     # key absent from right → nulls
        ],
        "k long, lts timestamp, tag string",
    )
    out = {
        r["tag"]: r
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            value_cols=["rid", "v"], tiebreak="rid",
        ).collect()
    }
    assert len(out) == 7
    assert out["before-any"]["asof_rid"] is None
    assert out["exactly-at"]["asof_rid"] == 101 and out["exactly-at"]["asof_v"] == 6.0
    assert out["between"]["asof_rid"] == 101
    assert out["second-exact"]["asof_rid"] == 102
    assert out["after-all"]["asof_rid"] == 102
    assert out["other-key"]["asof_rid"] == 200
    assert out["unknown-key"]["asof_rid"] is None


def test_asof_join_plan_is_single_shuffle_no_join(spark):
    right = spark.range(10).select(
        F.col("id").alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("rts"),
        F.col("id").alias("rid"),
    )
    left = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.timestamp_micros(F.col("id") * 2_000_000).alias("lts"),
    )
    df = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        value_cols=["rid"], tiebreak="rid",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:2000]
    assert "Window" in plan
