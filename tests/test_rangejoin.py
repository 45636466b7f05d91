"""Interval-containment join: assignment semantics over real sessions,
generic overlap semantics, bucket-boundary coverage, and the plan
guarantee the operator exists for (equi-join only — no nested-loop or
cartesian fallback)."""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_linking_spark.operators import events as EV
from entity_linking_spark.operators import rangejoin as RJ
from entity_linking_spark.sources.tables import load_table


def _ts(minute, second=0):
    return dt.datetime(2025, 3, 1, 10, minute, second)


def _intervals(spark, rows):
    return spark.createDataFrame(rows, ["key", "iv_id", "t_start", "t_end"])


def _points(spark, rows):
    return spark.createDataFrame(rows, ["pid", "key", "ts"])


def test_every_event_lands_in_exactly_one_session(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sess = EV.sessionize(ev).select("user_id", "session_idx", "t_start", "t_end")
    out = RJ.interval_join(
        ev.select("event_id", "user_id", "ts"),
        sess,
        key="user_id",
        point_ts="ts",
        start_col="t_start",
        end_col="t_end",
    )
    n_events = ev.count()
    assert out.count() == n_events  # gap sessions partition each user's events
    assert out.select("event_id").distinct().count() == n_events


def test_overlapping_intervals_emit_one_row_each(spark):
    iv = _intervals(
        spark,
        [
            ("u", 1, _ts(0), _ts(30)),
            ("u", 2, _ts(20), _ts(50)),  # overlaps iv 1 on [20, 30]
        ],
    )
    pts = _points(spark, [(1, "u", _ts(25)), (2, "u", _ts(5)), (3, "u", _ts(45))])
    out = RJ.interval_join(
        pts, iv, key="key", point_ts="ts", start_col="t_start", end_col="t_end"
    )
    got = sorted((r["pid"], r["iv_id"]) for r in out.collect())
    assert got == [(1, 1), (1, 2), (2, 1), (3, 2)]


def test_uncovered_point_dropped_and_bounds_inclusive(spark):
    iv = _intervals(spark, [("u", 1, _ts(10), _ts(20))])
    pts = _points(
        spark,
        [(1, "u", _ts(10)), (2, "u", _ts(20)), (3, "u", _ts(21)), (4, "v", _ts(15))],
    )
    out = RJ.interval_join(
        pts, iv, key="key", point_ts="ts", start_col="t_start", end_col="t_end"
    )
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]


def test_interval_spanning_many_buckets(spark):
    """A long interval must match points in every bucket it overlaps,
    including partial edge buckets."""
    iv = _intervals(spark, [("u", 1, _ts(0, 30), _ts(7, 30))])
    pts = _points(
        spark,
        [(m, "u", _ts(m)) for m in range(10)],
    )
    out = RJ.interval_join(
        pts,
        iv,
        key="key",
        point_ts="ts",
        start_col="t_start",
        end_col="t_end",
        bucket_minutes=1,
    )
    assert sorted(r["pid"] for r in out.collect()) == [1, 2, 3, 4, 5, 6, 7]


def test_plan_has_no_nested_loop_or_cartesian(spark):
    iv = _intervals(spark, [("u", 1, _ts(0), _ts(30))])
    pts = _points(spark, [(1, "u", _ts(5))])
    out = RJ.interval_join(
        pts, iv, key="key", point_ts="ts", start_col="t_start", end_col="t_end"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
