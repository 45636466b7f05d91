"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship entity-clustering pipeline at sf0.001.
`queries()` exposes one callable per implemented operator (SURVEY.md §2)
and `oracle_sql()` the DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from entity_linking_spark.functions.normalize import (
    normalize_text_col,
    normalize_text_sql,
)
from entity_linking_spark.sources.tables import load_table
from entity_linking_spark.sources.transcripts import (
    derive_transcripts,
    derive_transcripts_sql,
)


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_transcripts(load_table(spark, sf_dir, "documents"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derived transcripts at sf0.001 (placeholder until the full
    cluster pipeline lands this round)."""
    return _transcripts(spark, "/root/testdata/sf0.001")


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _transcripts(spark, sf_dir)


def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _transcripts(spark, sf_dir)
    return t.select(
        "conv_id", "turn_idx", normalize_text_col(F.col("text")).alias("norm_text")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_derive": q_transcripts,
        "normalize": q_normalize,
    }


def oracle_sql() -> dict[str, str]:
    tsql = derive_transcripts_sql("documents")
    return {
        "transcripts_derive": tsql,
        "normalize": (
            f"SELECT conv_id, turn_idx, {normalize_text_sql('text')} AS norm_text "
            f"FROM ({tsql})"
        ),
    }
