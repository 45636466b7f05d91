"""As-of (temporal) join — a core time-series operator Spark lacks.

For each left row, attach the most recent right row of the same key
whose timestamp is at or before the left timestamp (the "last known
value" join: trades←quotes, events←dimension snapshots, turns←model
deployments).

Implementation is the scalable union-and-scan pattern, NOT a range
join: tag both sides, union, and take a running `last(non-null)` over a
window partitioned by key and ordered by (ts, side, tiebreak). One
shuffle on the join key, O(n log n) per partition, zero pair blow-up —
a naive `left.ts >= right.ts` range join would produce |left|×|orders
per key| intermediate rows (quadratic in key activity), which at 10^12
rows is the difference between a job and an outage. Skewed keys shard
exactly like any other single-key shuffle (salt + re-merge if needed).

Tie semantics (deterministic, engine-portable): a right row AT the left
timestamp matches (side ordering puts right before left at equal ts);
among right rows sharing (key, ts) the one with the greatest tiebreak
column wins. The DuckDB twin states the same rule as a window-rank —
deliberately not DuckDB's native ASOF JOIN, whose equal-ts tie choice
is unspecified.

Reference analog: none (the reference is atemporal) — this is part of
the beyond-reference analytics surface, alongside the events family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """left columns + `asof_<value_col>` for each value col (null when no
    right row at or before the left row's timestamp exists for the key).

    `right` columns: key, right_ts, tiebreak, value_cols. `tiebreak`
    must be unique per (key, right_ts) group for determinism."""
    val_struct = F.struct(*[F.col(c) for c in value_cols])
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        val_struct.alias("_val"),
    )
    l_cols = left.columns
    lf = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_val"].dataType).alias("_val"),
        *[F.col(c) for c in l_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scanned = r.unionByName(lf, allowMissingColumns=True).withColumn(
        "_asof", F.last("_val", ignorenulls=True).over(w)
    )
    return scanned.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in l_cols],
        *[F.col("_asof")[c].alias(f"asof_{c}") for c in value_cols],
    )


def asof_join_sql(
    left_rel: str,
    right_rel: str,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str,
    left_cols: list[str],
) -> str:
    """DuckDB twin: per left row, rank matching right rows by
    (right_ts DESC, tiebreak DESC) and keep rank 1 — the same
    latest-at-or-before + greatest-tiebreak rule as the window scan."""
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    vsel = ", ".join(f"r.{c} AS asof_{c}" for c in value_cols)
    lout = ", ".join(left_cols)
    vout = ", ".join(f"asof_{c}" for c in value_cols)
    return f"""
    SELECT {lout}, {vout} FROM (
      SELECT {lsel}, {vsel},
             row_number() OVER (
               PARTITION BY l.rowid_
               ORDER BY r.{right_ts} DESC, r.{tiebreak} DESC
             ) AS rn_
      FROM (SELECT row_number() OVER () AS rowid_, * FROM ({left_rel})) l
      LEFT JOIN ({right_rel}) r
        ON l.{key} = r.{key} AND r.{right_ts} <= l.{left_ts}
    ) WHERE rn_ = 1
    """
