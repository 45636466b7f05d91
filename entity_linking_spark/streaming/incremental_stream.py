"""Structured Streaming ingestion for incremental entity linking.

`operators/incremental.py` is the pure fold: (previous clustering, new
batch) → updated clustering. This module is the streaming driver around
it — `readStream` over a growing transcripts directory, `foreachBatch`
folding each micro-batch into a persisted cluster state, with Spark's
own streaming checkpoint providing exactly-once batch replay on restart.

Reference analog: none (the 2013 reference is batch MapReduce end to
end); this is the north_star's "resumes from the last committed
checkpoint" requirement expressed with the engine Spark actually ships
for it. State layout (all paths under `state_dir`; Iceberg tables on a
real cluster — same call sites):

  state_dir/clusters/v=<k>/   (rec_key, cluster_id) after batch k
  state_dir/records/v=<k>/    prepared records after batch k
  state_dir/blocks/v=<k>/     capped-input blocks index after batch k
  state_dir/_VERSION          atomic pointer to the committed k
  <checkpoint_dir>            Spark streaming offsets/commits

Why versioned directories + a pointer file: `foreachBatch` must read the
previous state and write the next one; overwriting in place would read
and clobber the same files within one job. The version pointer commits
atomically via `os.replace` AFTER the new state is fully written, so a
crash mid-batch leaves the previous state intact and Spark's checkpoint
replays the interrupted batch against it (foreachBatch is at-least-once;
the fold is idempotent for a replayed batch because versions are keyed
by batch id — a replay overwrites its own half-written version, never
the committed one).

At 10^12 turns each state table is an Iceberg table and the version
pointer is the Iceberg snapshot — `overwritePartitions` gives the same
atomic-commit semantics these directories simulate.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from ..operators import blocking as B
from ..operators import clustering as C
from ..operators import incremental as INC
from ..plans.pipeline import LinkingConfig, build_blocks
from ..sources.transcripts import TRANSCRIPT_SCHEMA


class ClusterState:
    """Versioned persisted linking state (records, blocks, clusters)."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _vfile(self) -> str:
        return os.path.join(self.dir, "_VERSION")

    def version(self) -> int | None:
        try:
            with open(self._vfile()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _path(self, table: str, v: int) -> str:
        return os.path.join(self.dir, table, f"v={v}")

    def load(
        self,
        table: str,
        v: int | None = None,
        spark: SparkSession | None = None,
    ) -> DataFrame | None:
        """Read a state table. `spark` overrides the session — inside
        foreachBatch the micro-batch DataFrame belongs to a CLONED
        session, and unioning/joining plans from two sessions trips
        Catalyst's Union constraint rewrite (key-not-found on an
        attribute id); loading state through the batch's own session
        keeps every plan in one session."""
        v = self.version() if v is None else v
        if v is None:
            return None
        return (spark or self.spark).read.parquet(self._path(table, v))

    def write(
        self,
        tables: dict[str, DataFrame],
        v: int,
        wall_ms: float | None = None,
    ) -> None:
        """Write all tables under version v, then atomically move the
        pointer. A crash before the pointer move leaves the previous
        version committed; a batch replay rewrites the same v. Per-batch
        counter metrics (rows per state table, from parquet footers — no
        recompute) append to metrics.jsonl BEFORE the pointer move, so a
        metrics line without a matching committed version marks an
        interrupted batch in the audit trail (north_rule lineage)."""
        spark = next(iter(tables.values())).sparkSession
        for name, df in tables.items():
            df.write.mode("overwrite").parquet(self._path(name, v))
        rows = {
            name: spark.read.parquet(self._path(name, v)).count()
            for name in tables
        }
        with open(os.path.join(self.dir, "metrics.jsonl"), "a") as f:
            f.write(
                json.dumps(
                    {"version": v, "rows": rows, "wall_ms": wall_ms}
                )
                + "\n"
            )
        tmp = self._vfile() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._vfile())


def fold_batch(
    state: ClusterState,
    batch_df: DataFrame,
    batch_id: int,
    cfg: LinkingConfig | None = None,
) -> None:
    """foreachBatch body: fold one micro-batch of new transcript turns
    into the persisted clustering.

    First batch bootstraps with a full (batch-local) linking run; later
    batches run the incremental fold — (new,new) + (new,old) pairs only,
    merged with the previous clustering's star edges
    (`operators/incremental.incremental_link`)."""
    cfg = cfg or LinkingConfig()
    spark = batch_df.sparkSession
    # The union of parquet-loaded state with batch-derived frames can trip
    # Catalyst's Union constraint rewrite (NoSuchElementException on an
    # attribute id, observed on Spark 4.1). Constraint propagation only
    # infers extra predicates; the micro-batch session is a clone, so the
    # conf change is scoped to this fold.
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    if batch_df.isEmpty():
        return
    t0 = time.time()
    prev_v = state.version()
    new_records = B.prepare_records(batch_df)
    if prev_v is None:
        records = new_records.localCheckpoint()
        blocks = build_blocks(records, cfg)
        from ..operators import pairs as P
        from ..operators import scoring as S

        edges = S.match_edges(
            S.pair_features(P.block_pairs(blocks, cfg.block_cap), records)
        )
        clusters = C.clusters_with_singletons(
            records, edges, max_iter=cfg.cc_max_iter
        )
        state.write(
            {"records": records, "blocks": blocks, "clusters": clusters},
            int(batch_id),
            wall_ms=(time.time() - t0) * 1000,
        )
        return
    old_records = state.load("records", prev_v, spark=spark)
    old_blocks = state.load("blocks", prev_v, spark=spark)
    old_clusters = state.load("clusters", prev_v, spark=spark)
    clusters = INC.incremental_link(
        old_records,
        old_clusters,
        batch_df,
        cfg,
        old_blocks=old_blocks,
    )
    state.write(
        {
            "records": old_records.unionByName(new_records),
            "blocks": old_blocks.unionByName(build_blocks(new_records, cfg)),
            "clusters": clusters,
        },
        int(batch_id),
        wall_ms=(time.time() - t0) * 1000,
    )


def run_incremental_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    cfg: LinkingConfig | None = None,
    available_now: bool = True,
):
    """Start (or resume) the streaming incremental-linking job.

    input_dir: directory of transcript parquet files (a file stream —
    each newly landed file becomes part of the next micro-batch; on a
    real deployment this is the Iceberg/Kafka source, same plan).
    checkpoint_dir: Spark streaming checkpoint — offsets of processed
    files survive restarts, so a resumed job continues from the first
    unprocessed batch (north_rule resumability).

    `available_now=True` drains everything currently available and stops
    (the testable batch-drain trigger); False runs continuously.
    """
    cfg = cfg or LinkingConfig()
    state = ClusterState(spark, state_dir)
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: fold_batch(state, df, bid, cfg)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query, state
