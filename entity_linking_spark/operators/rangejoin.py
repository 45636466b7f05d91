"""Interval-containment (range) join — point-in-interval without the
pair blow-up.

`points ⋈ intervals ON key AND start <= ts <= end` is the second
time-series join Spark lacks natively (the first, as-of, is
`operators/asof.py`). Expressed directly, Catalyst plans the inequality
half as a broadcast-nested-loop or cartesian factor — |points| ×
|intervals per key| intermediate rows, an outage at 10^12 rows.

Scalable shape (the standard "bucketize the range dimension" pattern,
e.g. Spark's own range-join hints in Databricks runtime and the
interval-join of Flink's SQL runtime): quantize time into fixed-width
buckets; each interval explodes to the buckets it overlaps, each point
maps to exactly one bucket, and the join becomes an EQUI-join on
(key, bucket) + a residual containment filter. One shuffle, fanout
bounded by interval_duration / bucket_width + 1 — pick `bucket_minutes`
near the median interval length so the explode factor is ~2 and each
bucket holds few intervals. Bucket arithmetic is integer µs division —
no float, both engines agree exactly.

An event in several overlapping intervals emits one row per containing
interval (join semantics, not assignment); non-overlapping intervals
(e.g. gap sessions from `events.sessionize`) give exactly-one-row
semantics for covered points.

Reference analog: none (the reference is atemporal); beyond-reference
analytics surface alongside `asof_join` and the events family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET_MINUTES = 60


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_minutes: int = DEFAULT_BUCKET_MINUTES,
) -> DataFrame:
    """All point columns + the non-key interval columns, one output row
    per (point, containing interval); bounds inclusive on both ends.

    `intervals` must satisfy start <= end per row. Quadratic blow-up is
    impossible by construction: the only join is an equi-join on
    (key, bucket), so AQE skew splitting and salting apply as on any
    single-key shuffle."""
    width_us = bucket_minutes * 60 * 1_000_000
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    iv = (
        intervals.withColumn("_s_us", us(start_col))
        .withColumn("_e_us", us(end_col))
        .withColumn(
            "_bk",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros(CAST({start_col} AS TIMESTAMP)) DIV {width_us}"),
                    F.expr(f"unix_micros(CAST({end_col} AS TIMESTAMP)) DIV {width_us}"),
                )
            ),
        )
    )
    pt = points.withColumn("_p_us", us(point_ts)).withColumn(
        "_bk", F.expr(f"unix_micros(CAST({point_ts} AS TIMESTAMP)) DIV {width_us}")
    )
    ival_cols = [c for c in intervals.columns if c != key]
    joined = pt.join(iv, on=[key, "_bk"]).filter(
        (F.col("_p_us") >= F.col("_s_us")) & (F.col("_p_us") <= F.col("_e_us"))
    )
    return joined.select(
        *[F.col(c) for c in points.columns],
        *[F.col(c) for c in ival_cols],
    )


def interval_join_sql(
    points_rel: str,
    intervals_rel: str,
    key: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    point_cols: list[str],
    interval_cols: list[str],
) -> str:
    """DuckDB twin: the declarative BETWEEN join (fine at oracle scale;
    the bucketed plan exists for the 10^12-row regime, not for DuckDB)."""
    psel = ", ".join(f"p.{c}" for c in point_cols)
    isel = ", ".join(f"i.{c}" for c in interval_cols)
    return f"""
    SELECT {psel}, {isel}
    FROM ({points_rel}) p
    JOIN ({intervals_rel}) i
      ON p.{key} = i.{key}
     AND p.{point_ts} >= i.{start_col} AND p.{point_ts} <= i.{end_col}
    """
