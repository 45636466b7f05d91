"""Event-stream analytics over the `events` table
(event_id, ts, user_id, event_type, value, props-json).

The reference is pure batch with no time logic (SURVEY §2.9), but an
analytics engine over transcripts needs the standard event-time toolkit;
these operators provide it batch-first (the same DataFrame code is the
`foreachBatch` body under Structured Streaming — sessionization via gap
detection is the canonical example of a query that needs
`applyInPandasWithState` only when run continuously; in batch it is two
window functions).

Scale notes: every operator partitions by user_id (or event_type), so the
single shuffle is on the natural key; sessionization is two window passes
over the same partitioning — Catalyst reuses the sort. All outputs are
value-hashed against DuckDB twins (round(·,6) for float sums).

Session-timezone requirement: sessionize casts TIMESTAMP_NTZ → TIMESTAMP
and relies on the offsets cancelling in the difference, which holds only
under a fixed-offset session timezone. `session.get_spark` pins
spark.sql.session.timeZone=UTC for exactly this reason; running these
operators in a DST-shifting session timezone would move gaps that
straddle a transition by an hour and diverge from the DuckDB epoch_us
oracle. The assert below makes the requirement explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap from
    the previous event exceeds `gap_min` minutes. Output one row per
    session: (user_id, session_idx, n_events, t_start, t_end, total_value).

    Classic two-pass shape: lag → boundary flag → running sum = session
    index → aggregate. Both passes share Window.partitionBy(user_id)."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "")
    assert tz in ("UTC", "Etc/UTC", "GMT", "Z"), (
        f"sessionize requires a fixed-offset (UTC) session timezone, got {tz!r};"
        " NTZ→TZ casts must cancel in the gap difference (see module docstring)"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds on both engines (unix_timestamp truncates
    # to seconds and would disagree with the oracle at gap boundaries);
    # cast: parquet naive timestamps read as TIMESTAMP_NTZ, which
    # unix_micros rejects — the UTC-cast offset cancels in the difference
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    flagged = events.withColumn(
        "new_session",
        (
            F.coalesce(
                (us(F.col("ts")) - us(F.lag("ts").over(w)))
                > gap_min * 60 * 1_000_000,
                F.lit(True),
            )
        ).cast("int"),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def sessionize_sql(events_rel: str = "events", gap_min: int = SESSION_GAP_MIN) -> str:
    return f"""
    SELECT user_id, session_idx, count(*) AS n_events,
           min(ts) AS t_start, max(ts) AS t_end,
           round(sum(value), 6) AS total_value
    FROM (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      FROM (
        SELECT *,
               CAST(coalesce(
                 epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > {gap_min * 60 * 1_000_000},
                 TRUE) AS INT) AS new_session
        FROM ({events_rel})
      )
    )
    GROUP BY user_id, session_idx
    """


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Per-hour tumbling-window counts and value sums per event type —
    `date_trunc` instead of `F.window` so the bucket boundary is a plain
    timestamp column (portable and partition-prunable)."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def tumbling_counts_sql(events_rel: str = "events") -> str:
    return f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 6) AS total_value
    FROM ({events_rel})
    GROUP BY date_trunc('hour', ts), event_type
    """


def json_props(events: DataFrame) -> DataFrame:
    """Extract the typed `k` attribute from the props JSON string column —
    the engine's JSON scalar surface (the reference has none; transcripts
    tool payloads need it)."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def json_props_sql(events_rel: str = "events") -> str:
    return f"""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM ({events_rel})
    """


def user_topk_events(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k events per user by value (deterministic tie-break on
    event_id) — the W1/W5 bounded-top-k pattern on the events table."""
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("user_id", "event_id", "value", "rank")
    )


def user_topk_events_sql(events_rel: str = "events", k: int = 3) -> str:
    return f"""
    SELECT user_id, event_id, value, rank FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rank
      FROM ({events_rel})
    ) WHERE rank <= {k}
    """


def type_rollup(events: DataFrame) -> DataFrame:
    """ROLLUP aggregate over event_type — per-type rows plus the grand
    total (event_type NULL). The reference has no grouping-sets surface
    at all (SURVEY §2.4); this is engine-first analytics breadth. The
    NULL-marker semantics of Spark rollup and DuckDB GROUP BY ROLLUP
    coincide, so the oracle hash-matches directly."""
    return events.rollup("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def type_rollup_sql(events_rel: str) -> str:
    return f"""
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 6) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM ({events_rel})
    GROUP BY ROLLUP(event_type)
    """


def value_stats(events: DataFrame) -> DataFrame:
    """Per-type order statistics: count, min, max, mean, exact median
    (linear-interpolated percentile — Spark `percentile` and DuckDB
    `quantile_cont` share the interpolation rule, verified by the
    driver's value hash)."""
    return events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
        F.round(F.avg("value"), 6).alias("avg_v"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_v"),
    )


def value_stats_sql(events_rel: str) -> str:
    return f"""
    SELECT event_type, count(*) AS n,
           round(min(value), 6) AS min_v,
           round(max(value), 6) AS max_v,
           round(avg(value), 6) AS avg_v,
           round(quantile_cont(value, 0.5), 6) AS median_v
    FROM ({events_rel})
    GROUP BY event_type
    """


HOP_MIN = 30  # hop; window width = 2 * hop


def hopping_counts(events: DataFrame, hop_min: int = HOP_MIN) -> DataFrame:
    """Sliding (hopping) windows: width 2·hop, slide hop — each event
    belongs to exactly two windows, generated by exploding the two
    containing starts instead of `F.window` so the identical expression
    runs on the DuckDB oracle. Same UTC-session requirement as
    sessionize (the us() cast pattern)."""
    hop_us = hop_min * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    start1 = (us - (us % hop_us)).alias("s1")
    starts = F.array(start1, start1 - F.lit(hop_us))
    return (
        events.select(
            "event_type",
            "value",
            F.explode(starts).alias("w_us"),
        )
        .groupBy(
            F.timestamp_micros(F.col("w_us")).alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def hopping_counts_sql(events_rel: str = "events", hop_min: int = HOP_MIN) -> str:
    hop_us = hop_min * 60 * 1_000_000
    return f"""
    SELECT make_timestamp(w_us) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 6) AS total_value
    FROM (
      SELECT event_type, value,
             unnest([epoch_us(ts) - (epoch_us(ts) % {hop_us}),
                     epoch_us(ts) - (epoch_us(ts) % {hop_us}) - {hop_us}]) AS w_us
      FROM ({events_rel})
    )
    GROUP BY w_us, event_type
    """
