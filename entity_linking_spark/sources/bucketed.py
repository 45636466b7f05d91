"""Bucketed storage for co-located joins (the 100 TB shuffle eliminator).

Every scoring round joins `pairs ⋈ records` on rec_key twice
(operators/scoring.pair_features). At 10^12 turns the records table is
the big side, and re-shuffling it per run is the dominant avoidable
cost. The fix is storage-level: write the co-joined tables **bucketed by
rec_key** (hash-partitioned into a fixed bucket count at write time,
sorted within buckets). When BOTH sides of an equi-join are bucketed on
the join key with the same bucket count, the join runs with ZERO
Exchange — the shuffle was amortized into the writes. (One-sided
bucketing does not remove the shuffle in current Spark: the co-location
contract needs both writers to agree, which is what the Iceberg
`PARTITIONED BY (bucket(N, rec_key))` spec encodes table-wide; this
module uses the built-in catalog's `bucketBy` + `saveAsTable`, the
identical planner contract.)

tests/test_plans.py asserts the physical plan: two bucketed scans feed a
SortMergeJoin with no Exchange anywhere.

Reference analog: none — the reference re-reads TSV/SequenceFiles and
re-sorts per job (`EntityTFIDFIndexBuilder.java:152-155` pays a global
sort for every index build); bucketing amortizes that sort into the
write once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
) -> DataFrame:
    """Write `df` as a parquet table bucketed (and sorted) by
    `bucket_col`; returns the re-read table whose scans carry bucket
    metadata. `path` makes it an external table (keeps the warehouse
    out of the repo tree in tests)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
    return df.sparkSession.table(table)


def bucketed_records(
    spark: SparkSession,
    records: DataFrame,
    table: str = "els_records_bucketed",
    n_buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
) -> DataFrame:
    """Materialize the stage-0 records bucketed by rec_key — the join key
    of every downstream scoring/clustering equi-join."""
    return write_bucketed(records, table, "rec_key", n_buckets, path)
