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
    overwhelming bulk at scale — is never generated.

    Plan shape: the join's PROBE side is new rows only (`is_new` filtered
    below the join, which prunes the old branch of the union at the scan),
    the build side is the full capped block table. The asymmetric
    new×all join emits each (new, old) pair once and each (new, new) pair
    twice (once per direction); least/greatest + distinct restores the
    canonical a_key < b_key ordering. A symmetric all×all join filtered by
    `a.is_new OR b.is_new` would be wrong at scale: the disjunction
    references both sides, so it cannot push below the join and every
    old×old pair inside every block would be enumerated then discarded.

    The cap is computed over the UNION of old and new rows (a block's
    membership count includes both), so the admitted pair set is identical
    to what a full-batch run at the same cap would admit inside that block.
    """
    all_blocks = old_blocks.withColumn("is_new", F.lit(False)).unionByName(
        new_blocks.withColumn("is_new", F.lit(True))
    )
    capped = P.cap_blocks(all_blocks, cap)
    probe = capped.filter(F.col("is_new")).select("rec_key", "block_key")
    build = capped.select("rec_key", "block_key")
    a = probe.alias("a")
    b = build.alias("b")
    return (
        a.join(b, "block_key")
        .filter(F.col("a.rec_key") != F.col("b.rec_key"))
        .select(
            F.least("a.rec_key", "b.rec_key").alias("a_key"),
            F.greatest("a.rec_key", "b.rec_key").alias("b_key"),
        )
        .distinct()
    )


def incremental_link(
    old_records: DataFrame,
    old_clusters: DataFrame,
    new_transcripts: DataFrame,
    cfg: LinkingConfig | None = None,
    old_blocks: DataFrame | None = None,
) -> DataFrame:
    """(rec_key, cluster_id) over old ∪ new records.

    old_clusters: (rec_key, cluster_id) from the previous run (cluster_id
    = min member rec_key). New edges are merged with the old clustering's
    star edges so transitivity across batches is preserved: if a new turn
    bridges two old clusters, they merge (to the smaller min-key).

    `old_blocks` lets the caller pass the persisted blocks index of the
    previous run (at 10^12 turns that index is an Iceberg table; in the
    batch resume path the caller already materialized it for the previous
    clustering) instead of re-deriving it from old_records."""
    cfg = cfg or LinkingConfig()
    new_records = B.prepare_records(new_transcripts)
    if old_blocks is None:
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
