"""Threshold calibration: P/R/F1 across a score-threshold grid in one pass.

Reference analog: `evaluation/VerifyBaseline.java:90-137` and
`VerifyLoopyBeliefPropagation.java:88-134` sweep a confidence threshold
0.9 → 0.1 re-running the scorer per point. Relationally the whole sweep
is ONE pass: bucket each scored pair by score, count (gold, bucket)
cells, then a running (descending-threshold) cumulative sum turns bucket
counts into per-threshold TP/FP — no per-threshold rescan, which is the
difference between O(grid·pairs) and O(pairs) at 100 TB.

Input: scored pairs with a continuous `score` and a 0/1 `gold_match`.
Output: one row per threshold with tp/fp/fn, precision, recall, f1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GRID = 20  # thresholds at i/GRID for i in 1..GRID


def threshold_sweep(scored_labeled: DataFrame, grid: int = DEFAULT_GRID) -> DataFrame:
    """(threshold, tp, fp, fn, precision, recall, f1), one row per grid
    point. A pair counts as predicted-match at threshold t iff score >= t.

    Single aggregation + a grid-sized window — the per-threshold counts
    come from a cumulative sum over score buckets, descending."""
    total_pos = scored_labeled.agg(
        F.sum("gold_match").cast("long").alias("pos")
    )
    # bucket = ceil(score*grid) clamped to [0, grid]: scores in
    # ((b-1)/grid, b/grid] fall in bucket b, so "score >= b/grid" is the
    # cumulative count of buckets >= b... score == b/grid exactly lands in
    # bucket b and IS >= b/grid: correct.
    bucketed = scored_labeled.select(
        F.least(
            F.lit(grid),
            F.greatest(F.lit(0), F.ceil(F.col("score") * grid).cast("int")),
        ).alias("bucket"),
        F.col("gold_match").cast("long").alias("gold"),
    )
    spark = scored_labeled.sparkSession
    spine = spark.range(0, grid + 1).select(F.col("id").cast("int").alias("bucket"))
    cells = spine.join(
        bucketed.groupBy("bucket").agg(
            F.sum("gold").alias("bpos"), F.count("*").alias("btot")
        ),
        "bucket",
        "left",
    ).select(
        "bucket",
        F.coalesce("bpos", F.lit(0)).alias("bpos"),
        F.coalesce("btot", F.lit(0)).alias("btot"),
    )
    # cumulative from the top bucket down = counts with score >= b/grid
    w = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.select(
        "bucket",
        F.sum("bpos").over(w).alias("tp"),
        (F.sum("btot").over(w) - F.sum("bpos").over(w)).alias("fp"),
    )
    out = (
        cum.filter(F.col("bucket") >= 1)
        .crossJoin(F.broadcast(total_pos))
        .select(
            F.round(F.col("bucket") / grid, 6).alias("threshold"),
            "tp",
            "fp",
            (F.col("pos") - F.col("tp")).alias("fn"),
        )
    )
    p = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    r = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return out.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(
            F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0)), 6
        ).alias("f1"),
    )


def best_threshold(sweep: DataFrame) -> dict:
    """Argmax-F1 row as a dict (driver-side; grid-sized data)."""
    row = sweep.orderBy(F.desc("f1"), F.asc("threshold")).first()
    return {k: row[k] for k in ("threshold", "precision", "recall", "f1")}


def threshold_sweep_sql(scored_rel: str, grid: int = DEFAULT_GRID) -> str:
    """DuckDB twin of `threshold_sweep`. `scored_rel` must yield
    (score double, gold_match int). Same bucket arithmetic on the same
    doubles -> identical cells in both engines."""
    return f"""
    SELECT round(CAST(bucket AS DOUBLE) / {grid}, 6) AS threshold,
           tp, fp, (pos - tp) AS fn,
           round(CAST(tp AS DOUBLE) / greatest(tp + fp, 1), 6) AS precision,
           round(CAST(tp AS DOUBLE) / greatest(tp + (pos - tp), 1), 6) AS recall,
           round(CASE WHEN (CAST(tp AS DOUBLE) / greatest(tp + fp, 1))
                         + (CAST(tp AS DOUBLE) / greatest(tp + (pos - tp), 1)) > 0
                 THEN 2 * (CAST(tp AS DOUBLE) / greatest(tp + fp, 1))
                        * (CAST(tp AS DOUBLE) / greatest(tp + (pos - tp), 1))
                      / ((CAST(tp AS DOUBLE) / greatest(tp + fp, 1))
                         + (CAST(tp AS DOUBLE) / greatest(tp + (pos - tp), 1)))
                 ELSE 0.0 END, 6) AS f1
    FROM (
      SELECT s.bucket,
             CAST(sum(s.bpos) OVER w AS BIGINT) AS tp,
             CAST(sum(s.btot) OVER w - sum(s.bpos) OVER w AS BIGINT) AS fp
      FROM (
        SELECT g.bucket,
               coalesce(c.bpos, 0) AS bpos, coalesce(c.btot, 0) AS btot
        FROM (SELECT unnest(range(0, {grid} + 1)) AS bucket) g
        LEFT JOIN (
          SELECT least({grid}, greatest(0, CAST(ceil(score * {grid}) AS INT))) AS bucket,
                 CAST(sum(gold_match) AS BIGINT) AS bpos, count(*) AS btot
          FROM ({scored_rel})
          GROUP BY 1
        ) c USING (bucket)
      ) s
      WINDOW w AS (ORDER BY s.bucket DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    CROSS JOIN (SELECT CAST(coalesce(sum(gold_match), 0) AS BIGINT) AS pos FROM ({scored_rel}))
    WHERE bucket >= 1
    """
