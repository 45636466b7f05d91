"""CLI entrypoint for the record-linkage pipeline.

Cluster usage (north_rule: `spark-submit --py-files` on a multi-executor
cluster; spark-submit takes a *script path*, and the launcher script
`run_pipeline.py` at the repo root exists for exactly that — `cli.py`
itself uses package-relative imports and cannot be submitted directly):

    zip -r els.zip entity_linking_spark
    spark-submit --master <cluster-master> --py-files els.zip \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        run_pipeline.py \
        --input <iceberg table / parquet path> \
        --checkpoint <dir> --output <dir>

The master is NOT set here when running under spark-submit —
`session.get_spark` only calls `builder.master()` for an explicit
`--master` argument or a plain-python launch, so spark-submit's
`--master`/conf always wins (it would otherwise be silently overridden
with local mode).

Local smoke:  python -m entity_linking_spark.cli --input /root/testdata/sf0.001

The driver-side logic is intentionally thin: load → LinkingPipeline.run →
write clusters + metrics. All scale behavior (AQE, skew join, block caps,
checkpointed supersteps) lives in the library, not here.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession

from .operators import blocking as B  # noqa: F401  (re-exported for --py-files users)
from .plans.pipeline import LinkingConfig, LinkingPipeline
from .session import get_spark
from .sources.tables import load_table
from .sources.transcripts import derive_transcripts


def _load_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Path ending in a testdata sf dir → derive transcripts from its
    documents table; otherwise read the transcripts table directly
    (parquet dir or Iceberg identifier)."""
    try:
        docs = load_table(spark, path, "documents")
        return derive_transcripts(docs)
    except Exception:
        if "." in path and "/" not in path:
            return spark.read.format("iceberg").load(path)
        return spark.read.parquet(path)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="entity-linking-spark pipeline")
    ap.add_argument("--input", required=True, help="transcripts source (sf dir, parquet dir, or iceberg table)")
    ap.add_argument("--output", default=None, help="output dir for clusters parquet")
    ap.add_argument("--checkpoint", default=None, help="checkpoint dir for stage commits/resume")
    ap.add_argument("--block-cap", type=int, default=None)
    ap.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    ap.add_argument(
        "--stream",
        action="store_true",
        help="run the Structured Streaming incremental-linking driver over "
        "--input (a directory where transcript parquet files land); state "
        "goes to --output, streaming offsets to --checkpoint",
    )
    ap.add_argument(
        "--follow",
        action="store_true",
        help="with --stream: keep running for new files instead of "
        "draining what's available and exiting",
    )
    args = ap.parse_args(argv)

    spark = get_spark("entity-linking-pipeline", master=args.master)
    cfg = LinkingConfig()
    if args.block_cap:
        cfg.block_cap = args.block_cap

    if args.stream:
        if not (args.output and args.checkpoint):
            ap.error("--stream requires --output (state dir) and --checkpoint")
        from .streaming.incremental_stream import run_incremental_stream

        query, state = run_incremental_stream(
            spark,
            args.input,
            state_dir=args.output,
            checkpoint_dir=args.checkpoint,
            cfg=cfg,
            available_now=not args.follow,
        )
        query.awaitTermination()
        v = state.version()
        clusters = state.load("clusters")
        print(
            json.dumps(
                {
                    "state_version": v,
                    "clusters_rows": 0 if clusters is None else clusters.count(),
                }
            )
        )
        spark.stop()
        return 0

    pipe = LinkingPipeline(spark, cfg, checkpoint_dir=args.checkpoint)
    out = pipe.run(_load_transcripts(spark, args.input))
    clusters = out["clusters"]
    if args.output:
        clusters.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = clusters.count()
    print(json.dumps({"clusters_rows": n, "metrics": pipe.metrics}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
