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
from entity_linking_spark.operators import blocking as B
from entity_linking_spark.operators import clustering as C
from entity_linking_spark.operators import pairs as P
from entity_linking_spark.operators import scoring as S
from entity_linking_spark.oracle import chain as ORACLE
from entity_linking_spark.plans.pipeline import LinkingConfig, build_blocks
from entity_linking_spark.sources.tables import load_table
from entity_linking_spark.sources.transcripts import (
    derive_transcripts,
    derive_transcripts_sql,
)

CFG = LinkingConfig()


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_transcripts(load_table(spark, sf_dir, "documents"))


def _records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.prepare_records(_transcripts(spark, sf_dir))


def _blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_blocks(_records(spark, sf_dir), CFG)


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.block_pairs(_blocks(spark, sf_dir), CFG.block_cap)


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.pair_features(_pairs(spark, sf_dir), _records(spark, sf_dir))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _transcripts(spark, sf_dir)


def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", normalize_text_col(F.col("text")).alias("norm_text")
    )


def q_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokens array stringified for stable hashing
    return _records(spark, sf_dir).select(
        "rec_key",
        "conv_id",
        "turn_idx",
        "norm_text",
        F.array_join("tokens", " ").alias("tokens_joined"),
        F.size("tokens").alias("n_tokens"),
    )


def q_first_token_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.first_token_blocks(_records(spark, sf_dir))


def q_token_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.token_blocks(_records(spark, sf_dir))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return B.minhash_signatures(
        _records(spark, sf_dir), CFG.n_perm, CFG.shingle, CFG.seed, CFG.hash_mode
    )


def q_lsh_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = B.minhash_signatures(
        _records(spark, sf_dir), CFG.n_perm, CFG.shingle, CFG.seed, CFG.hash_mode
    )
    return B.lsh_blocks(sigs, CFG.n_perm, CFG.band_rows)


def q_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir)


def q_pair_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _features(spark, sf_dir).select(
        "a_key", "b_key", "inter", "uni", "lev", "maxlen", "exact"
    )


def q_match_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.match_edges(_features(spark, sf_dir))


def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    records = _records(spark, sf_dir)
    edges = S.match_edges(S.pair_features(P.block_pairs(_blocks(spark, sf_dir), CFG.block_cap), records))
    return C.clusters_with_singletons(records, edges, max_iter=CFG.cc_max_iter)


def q_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram — the engine's A8-counter analog as a query."""
    return (
        q_entity_clusters(spark, sf_dir)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_members"))
        .groupBy("n_members")
        .agg(F.count("*").alias("n_clusters"))
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full blocking → scoring → clustering pipeline at sf0.001."""
    return q_entity_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_derive": q_transcripts,
        "normalize": q_normalize,
        "records_prepare": q_records,
        "blocks_first_token": q_first_token_blocks,
        "blocks_token": q_token_blocks,
        "minhash_signatures": q_minhash_signatures,
        "lsh_blocks": q_lsh_blocks,
        "candidate_pairs": q_candidate_pairs,
        "pair_features": q_pair_features,
        "match_edges": q_match_edges,
        "entity_clusters": q_entity_clusters,
        "cluster_sizes": q_cluster_sizes,
    }


def oracle_sql() -> dict[str, str]:
    tsql = derive_transcripts_sql("documents")
    recs = B.prepare_records_sql(tsql)
    sig_sql = B.minhash_signatures_sql(recs, CFG.n_perm, CFG.shingle, CFG.seed)
    return {
        "transcripts_derive": tsql,
        "normalize": (
            f"SELECT conv_id, turn_idx, {normalize_text_sql('text')} AS norm_text "
            f"FROM ({tsql})"
        ),
        "records_prepare": (
            f"SELECT rec_key, conv_id, turn_idx, norm_text, "
            f"array_to_string(tokens, ' ') AS tokens_joined, "
            f"len(tokens) AS n_tokens FROM ({recs})"
        ),
        "blocks_first_token": B.first_token_blocks_sql(recs),
        "blocks_token": B.token_blocks_sql(recs),
        "minhash_signatures": sig_sql,
        "lsh_blocks": B.lsh_blocks_sql(sig_sql, CFG.n_perm, CFG.band_rows),
        "candidate_pairs": ORACLE.stage_sql("SELECT * FROM pairs", CFG),
        "pair_features": ORACLE.stage_sql(
            "SELECT a_key, b_key, inter, uni, lev, maxlen, exact FROM features", CFG
        ),
        "match_edges": ORACLE.stage_sql("SELECT * FROM edges", CFG),
        "entity_clusters": ORACLE.clusters_oracle_sql(CFG),
        "cluster_sizes": (
            "SELECT n_members, count(*) AS n_clusters FROM ("
            "  SELECT cluster_id, count(*) AS n_members FROM ("
            f"   {ORACLE.clusters_oracle_sql(CFG)}"
            "  ) GROUP BY cluster_id"
            ") GROUP BY n_members"
        ),
    }
