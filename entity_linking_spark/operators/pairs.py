"""Block-local candidate-pair generation.

Reference analog: the all-pairs loops inside one document's candidate sets
(`loopybeliefpropagation/CocitationMap.java:22-48`,
`baseline/RandomGraphWalk.java:240-276`) plus the fan-out guard that skips
mentions with > MAX_CANDIDATES=2000 candidates
(`md/MentionDetection.java:23-24,178-181`).

Spark shape: self-join on block_key with `a.rec_key < b.rec_key`, after a
window-count cap drops oversized blocks. The cap bounds the quadratic
explosion to cap²/2 per block — the single most important skew control in
the whole engine: with AQE skew-join splitting this keeps every shuffle
partition bounded regardless of key distribution at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BLOCK_CAP = 64


def cap_blocks(blocked: DataFrame, cap: int = DEFAULT_BLOCK_CAP) -> DataFrame:
    """Drop all rows of blocks with more than `cap` members (F4 analog)."""
    w = Window.partitionBy("block_key")
    return (
        blocked.withColumn("_bn", F.count("*").over(w))
        .filter(F.col("_bn") <= cap)
        .drop("_bn")
    )


def cap_blocks_sql(blocked_rel: str, cap: int = DEFAULT_BLOCK_CAP) -> str:
    return f"""
    SELECT rec_key, block_key FROM (
      SELECT rec_key, block_key, count(*) OVER (PARTITION BY block_key) AS _bn
      FROM ({blocked_rel})
    ) WHERE _bn <= {cap}
    """


def block_pairs(blocked: DataFrame, cap: int = DEFAULT_BLOCK_CAP) -> DataFrame:
    """(a_key, b_key) distinct candidate pairs, a_key < b_key. A pair seen
    in several blocks is emitted once (the later scorer computes each pair
    feature exactly once — the reference's memo-map analog,
    `RandomGraphWalk.java:233-239`, without the in-heap cache)."""
    capped = cap_blocks(blocked, cap)
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(b, "block_key")
        .filter(F.col("a.rec_key") < F.col("b.rec_key"))
        .select(F.col("a.rec_key").alias("a_key"), F.col("b.rec_key").alias("b_key"))
        .distinct()
    )


def block_pairs_sql(blocked_rel: str, cap: int = DEFAULT_BLOCK_CAP) -> str:
    return f"""
    SELECT DISTINCT a.rec_key AS a_key, b.rec_key AS b_key
    FROM ({cap_blocks_sql(blocked_rel, cap)}) a
    JOIN ({cap_blocks_sql(blocked_rel, cap)}) b USING (block_key)
    WHERE a.rec_key < b.rec_key
    """
