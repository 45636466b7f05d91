"""Table access layer.

Production target is Iceberg (`spark.read.format("iceberg").load(tbl)`) per
the north_star; this sandbox has no Iceberg runtime jars, so the layer reads
parquet directories with the same schemas and keeps the Iceberg call sites
behind one function. Reference analog: the SequenceFile scans in every
index builder (`/root/reference/src/knowledgebase/EntityMentionIndexBuilder.java:280-283`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table. Column pruning + predicate pushdown happen
    downstream via Catalyst; never cache here."""
    if name not in TPCH_TABLES:
        raise KeyError(f"unknown table {name!r}")
    fmt = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    if fmt == "iceberg":  # production path (cluster with Iceberg catalog)
        return spark.read.format("iceberg").load(f"{sf_dir}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def ensure_scan_parallelism(
    spark: SparkSession, df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Compute-parallelism floor for small-file scans.

    A parquet scan parallelizes at file-split granularity, and a split
    cannot cross a row-group boundary — so a table stored as one small
    file (one row group) is ONE task, and every CPU-bound expression
    evaluated in that scan stage (normalize + tokenize + hash +
    higher-order-function folds) runs on one core no matter how many the
    session has. At production scale a table is thousands of splits and
    this is a no-op (the condition never fires, no exchange is added);
    below the floor it pays one tiny hash exchange (KBs here) to let the
    expression work use the whole machine. Callers on the narrow-plan
    hot path (plan tests pin scan+project shapes) simply don't opt in.
    """
    n = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
