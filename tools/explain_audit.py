"""Physical-plan audit: prints `explain(formatted)` for the headline
queries and greps for the scale-critical properties:

  * broadcast joins where a side is small (dims, query vectors)
  * whole-stage codegen coverage (no interpreted fallback in hot paths)
  * partial aggregation (`HashAggregate` pairs) before shuffles
  * AQE enabled markers

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Writes a one-line verdict per query; full plans with -v.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from entity_linking_spark.session import get_spark  # noqa: E402

AUDIT = [
    "records_prepare",
    "minhash_signatures",
    "lsh_blocks",
    "candidate_pairs",
    "pair_features",
    "entity_clusters",
    "dedup_minhash",
    "simhash_signatures",
    "ann_bruteforce",
    "token_tfidf",
    "text_stats",
    "dict_blocks",
    "fuzzy_dict_blocks",
    "scored_pairs_full",
    "pair_jaro_winkler",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_local_volume",
    "events_session_attr",
    "events_asof_orders",
    "hll_distinct_docs",
    "cms_token_counts",
    "bloom_prune_orders",
    "events_value_quantiles",
    "docs_sample",
    "docs_split",
    "docs_stratified_cap",
    "embedding_kmeans",
    "semdedup",
    "docs_dsir_score",
    "bpe_token_counts",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.001"
    verbose = "-v" in sys.argv
    only = [a for a in sys.argv[2:] if not a.startswith("-")]
    spark = get_spark("explain-audit", master="local[4]")
    qs = entry_mod.queries()
    for name in only or AUDIT:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        n_codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
        n_bcast = len(re.findall(r"BroadcastHashJoin", plan))
        n_shuffle = len(re.findall(r"\(\d+\) Exchange\b", plan))
        n_sortmerge = len(re.findall(r"SortMergeJoin", plan))
        partial_agg = len(re.findall(r"HashAggregate", plan))
        print(
            f"{name:24s} codegen={n_codegen:<3d} broadcast={n_bcast:<3d} "
            f"shuffles={n_shuffle:<3d} smj={n_sortmerge:<2d} hashagg={partial_agg:<3d}"
        )
        if verbose:
            print(plan)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
