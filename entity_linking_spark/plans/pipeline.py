"""End-to-end record-linkage pipeline: ingest → block → score → cluster.

This is the engine's `WikiPipeline`/`BaselinePipeline` analog
(`/root/reference/src/knowledgebase/WikiPipeline.java:43-99`,
`/root/reference/src/baseline/BaselinePipeline.java:162-240`) — but instead
of hand-wired MapReduce jobs connected by HDFS paths, stages are lazy
DataFrame transformations; materialization happens only at declared
checkpoint boundaries.

Resumability (north_rule): each stage can commit to a checkpoint store
(parquet here; Iceberg `overwritePartitions` on a real cluster — same call
site) together with a manifest entry and per-stage lineage metrics
(stage, rows, wall_ms, partitions). A rerun with the same checkpoint dir
loads committed stages instead of recomputing — the analog of the
reference's job-level restartability via persisted HDFS outputs.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blocking as B
from ..operators import clustering as C
from ..operators import dictionary as DICT
from ..operators import pairs as P
from ..operators import scoring as S


@dataclass
class LinkingConfig:
    n_perm: int = B.DEFAULT_N_PERM
    band_rows: int = B.DEFAULT_BAND_ROWS
    shingle: int = B.DEFAULT_SHINGLE
    block_cap: int = P.DEFAULT_BLOCK_CAP
    seed: int = 42
    hash_mode: str = "portable"  # 'fast' (xxhash64) in production
    use_first_token: bool = True
    use_tokens: bool = True
    use_lsh: bool = True
    # J3/S3: alias-dictionary blocks (corpus-derived by default; pass an
    # external dictionary DataFrame to build_blocks to override). This is
    # the only block family that recovers acronym/short-form aliases.
    use_dict: bool = True
    # SymSpell-style deletion-neighborhood blocks: typo-tolerant unigram
    # dictionary (linear-time alternative to pairwise edit distance)
    use_fuzzy_dict: bool = True
    cc_max_iter: int = 20
    extra: dict = field(default_factory=dict)


def build_blocks(
    records: DataFrame, cfg: LinkingConfig, dictionary: DataFrame | None = None
) -> DataFrame:
    parts = []
    if cfg.use_first_token:
        parts.append(B.first_token_blocks(records))
    if cfg.use_tokens:
        parts.append(B.token_blocks(records))
    if cfg.use_lsh:
        sigs = B.minhash_signatures(
            records, cfg.n_perm, cfg.shingle, cfg.seed, cfg.hash_mode
        )
        parts.append(B.lsh_blocks(sigs, cfg.n_perm, cfg.band_rows))
    if cfg.use_dict:
        if dictionary is None:
            dictionary = DICT.alias_dictionary(records)
        parts.append(DICT.dict_blocks(records, dictionary))
    if cfg.use_fuzzy_dict:
        parts.append(DICT.fuzzy_dict_blocks(records))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


class LinkingPipeline:
    """Composable stage runner with optional checkpoint/resume + lineage.

    stages: records → blocks → pairs → features → edges → clusters
    """

    STAGES = ("records", "blocks", "pairs", "features", "edges", "clusters")

    def __init__(
        self,
        spark: SparkSession,
        cfg: LinkingConfig | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or LinkingConfig()
        self.ckpt = checkpoint_dir
        self.metrics: list[dict] = []

    # -- checkpoint store ---------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.ckpt, "_MANIFEST.json")

    def _manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {"stages": {}}

    def _commit(self, stage: str, df: DataFrame, wall_ms: float) -> DataFrame:
        """Materialize a stage. With a checkpoint dir: write parquet, record
        manifest + lineage. Without: localCheckpoint to cut lineage."""
        if not self.ckpt:
            out = df.localCheckpoint()
            n = out.count()
            self.metrics.append({"stage": stage, "rows": n, "wall_ms": wall_ms})
            return out
        path = os.path.join(self.ckpt, stage)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # per-partition lineage (north_rule): rows per output partition
        part_rows = (
            out.groupBy(F.spark_partition_id().alias("pid")).count().collect()
        )
        n = sum(r["count"] for r in part_rows)
        man = self._manifest()
        man["stages"][stage] = {
            "path": path,
            "rows": n,
            "wall_ms": wall_ms,
            "partitions": len(part_rows),
            "committed_at": time.time(),
        }
        os.makedirs(self.ckpt, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic commit point
        self.metrics.append(
            {
                "stage": stage,
                "rows": n,
                "wall_ms": wall_ms,
                "partitions": len(part_rows),
                "partition_rows": {str(r["pid"]): r["count"] for r in part_rows},
            }
        )
        return out

    def _resume(self, stage: str) -> DataFrame | None:
        if not self.ckpt:
            return None
        info = self._manifest()["stages"].get(stage)
        if info and os.path.exists(info["path"]):
            self.metrics.append({"stage": stage, "rows": info["rows"], "resumed": True})
            return self.spark.read.parquet(info["path"])
        return None

    # -- stage graph ----------------------------------------------------------
    def run(self, transcripts: DataFrame) -> dict[str, DataFrame]:
        cfg = self.cfg
        out: dict[str, DataFrame] = {}

        def stage(name: str, build):
            resumed = self._resume(name)
            if resumed is not None:
                out[name] = resumed
                return resumed
            t0 = time.time()
            df = build()
            df = self._commit(name, df, (time.time() - t0) * 1000)
            out[name] = df
            return df

        records = stage("records", lambda: B.prepare_records(transcripts))
        blocks = stage("blocks", lambda: build_blocks(records, cfg))
        prs = stage("pairs", lambda: P.block_pairs(blocks, cfg.block_cap))
        feats = stage("features", lambda: S.pair_features(prs, records))
        edges = stage("edges", lambda: S.match_edges(feats))
        stage(
            "clusters",
            lambda: C.clusters_with_singletons(
                records, edges, max_iter=cfg.cc_max_iter
            ),
        )
        return out

    def metrics_df(self) -> DataFrame:
        rows = [
            (
                m["stage"],
                int(m["rows"]),
                float(m.get("wall_ms", 0.0)),
                bool(m.get("resumed", False)),
            )
            for m in self.metrics
        ]
        return self.spark.createDataFrame(
            rows, "stage string, rows long, wall_ms double, resumed boolean"
        )
