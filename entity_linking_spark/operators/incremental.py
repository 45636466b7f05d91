"""Incremental linking: fold a batch of new turns into existing clusters.

The production deployment of a linking pipeline is incremental — new
transcript turns arrive continuously, and recomputing all O(N²/blocks)
pairs over 10^12 turns per batch is not an option. This operator assigns
new records to clusters touching only:

  * (new, new) pairs, and
  * (new, existing) pairs within shared blocking keys,

then merges the resulting match edges with the *star edges* of the
existing clustering (member → cluster_id), so connected components only
re-resolves components actually touched by the batch. Cluster ids stay
the min-member convention, so an untouched cluster keeps its id —
the invariant that makes the operation idempotent and auditable.

This is the `foreachBatch` body under Structured Streaming; in batch mode
it is the resume path after ingesting a new partition of the transcripts
table. Reference analog: none — the reference re-runs per-document from
scratch; incremental maintenance is what the relational re-design buys.

Scale note: the expensive input is the existing blocks index. At 10^12
turns that index is a persisted (Iceberg) table keyed by block_key,
bucketed so the (new-blocks ⋈ old-blocks) join is partition-local; here it
is recomputed when not supplied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.pipeline import LinkingConfig, build_blocks
from . import blocking as B
from . import clustering as C
from . import pairs as P
from . import scoring as S


def incremental_pairs(
    old_blocks: DataFrame, new_blocks: DataFrame, cap: int = P.DEFAULT_BLOCK_CAP
) -> DataFrame:
    """Candidate pairs where at least one side is new: (new,new) pairs
    plus (old,new) pairs sharing a block key. The old×old quadrant — the
    overwhelming bulk at scale — is never generated."""
    all_blocks = old_blocks.withColumn("is_new", F.lit(False)).unionByName(
        new_blocks.withColumn("is_new", F.lit(True))
    )
    capped = P.cap_blocks(all_blocks, cap)
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(b, "block_key")
        .filter(F.col("a.rec_key") < F.col("b.rec_key"))
        .filter(F.col("a.is_new") | F.col("b.is_new"))
        .select(F.col("a.rec_key").alias("a_key"), F.col("b.rec_key").alias("b_key"))
        .distinct()
    )


def incremental_link(
    old_records: DataFrame,
    old_clusters: DataFrame,
    new_transcripts: DataFrame,
    cfg: LinkingConfig | None = None,
) -> DataFrame:
    """(rec_key, cluster_id) over old ∪ new records.

    old_clusters: (rec_key, cluster_id) from the previous run (cluster_id
    = min member rec_key). New edges are merged with the old clustering's
    star edges so transitivity across batches is preserved: if a new turn
    bridges two old clusters, they merge (to the smaller min-key)."""
    cfg = cfg or LinkingConfig()
    new_records = B.prepare_records(new_transcripts)
    old_blocks = build_blocks(old_records, cfg)
    new_blocks = build_blocks(new_records, cfg)
    prs = incremental_pairs(old_blocks, new_blocks, cfg.block_cap)
    all_records = old_records.unionByName(new_records)
    feats = S.pair_features(prs, all_records)
    new_edges = S.match_edges(feats)
    star_edges = old_clusters.filter(F.col("rec_key") != F.col("cluster_id")).select(
        F.col("rec_key").alias("a_key"), F.col("cluster_id").alias("b_key")
    )
    edges = new_edges.unionByName(star_edges)
    return C.clusters_with_singletons(all_records, edges, max_iter=cfg.cc_max_iter)
