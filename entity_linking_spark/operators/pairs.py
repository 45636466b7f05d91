"""Block-local candidate-pair generation.

Reference analog: the all-pairs loops inside one document's candidate sets
(`loopybeliefpropagation/CocitationMap.java:22-48`,
`baseline/RandomGraphWalk.java:240-276`) plus the fan-out guard that skips
mentions with > MAX_CANDIDATES=2000 candidates
(`md/MentionDetection.java:23-24,178-181`).

Spark shape: self-join on block_key with `a.rec_key < b.rec_key`, after a
groupBy-count + semi-join cap drops oversized blocks. The cap bounds the quadratic
explosion to cap²/2 per block — the single most important skew control in
the whole engine: with AQE skew-join splitting this keeps every shuffle
partition bounded regardless of key distribution at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BLOCK_CAP = 64


def cap_blocks(blocked: DataFrame, cap: int = DEFAULT_BLOCK_CAP) -> DataFrame:
    """Drop all rows of blocks with more than `cap` members (F4 analog).

    Shape: groupBy-count + semi-join, NOT `count(*) over (partition by
    block_key)`. The window form shuffles every row of a hot block into a
    single task's sort buffer before the cap can drop it — the pathological
    key the cap exists to defend against would itself become the skew
    victim. The groupBy gets map-side partial aggregation (a stop-word key
    collapses to one row per map partition) and the join back is on the
    already-aggregated, bounded key set; AQE skew-join splitting applies to
    the join, which it never does for window partitions."""
    ok = (
        blocked.groupBy("block_key")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= cap)
        .select("block_key")
    )
    return blocked.join(ok, "block_key").select(*blocked.columns)


def cap_blocks_sql(blocked_rel: str, cap: int = DEFAULT_BLOCK_CAP) -> str:
    return f"""
    SELECT b.rec_key, b.block_key
    FROM ({blocked_rel}) b
    JOIN (
      SELECT block_key FROM ({blocked_rel})
      GROUP BY block_key HAVING count(*) <= {cap}
    ) ok USING (block_key)
    """


def block_pairs(blocked: DataFrame, cap: int = DEFAULT_BLOCK_CAP) -> DataFrame:
    """(a_key, b_key) distinct candidate pairs, a_key < b_key. A pair seen
    in several blocks is emitted once (the later scorer computes each pair
    feature exactly once — the reference's memo-map analog,
    `RandomGraphWalk.java:233-239`, without the in-heap cache).

    Callers with several consumers of the capped table (pair generation,
    co-membership stats, degree counts) should materialize
    `cap_blocks(...)` once — cache/checkpoint/Iceberg — and call
    `pairs_from_capped`: the cap subtree (scan + agg + join) is otherwise
    re-evaluated per consumer and per self-join side."""
    return pairs_from_capped(cap_blocks(blocked, cap))


def pairs_from_capped(capped: DataFrame) -> DataFrame:
    """`block_pairs` over an already-capped (ideally materialized) block
    table."""
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
