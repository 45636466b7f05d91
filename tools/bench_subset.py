"""Re-measure a subset of queries() with many passes (VERDICT r4 item 2:
four per-query medians regressed >1.5x r3→r4 with no code change behind
them; suspected host steal. Protocol: >=5 passes on an idle box, memo +
block-manager cache cleared between passes, report per-pass walls +
median so a steal spike is visible as an outlier rather than folded
into a median of 3).

    python tools/bench_subset.py pair_tfidf_cosine docs_dsir_sample \
        bpe_merges keyphrase_topk [--runs 7]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("ELS_HASH_MODE", "fast")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> int:
    argv = sys.argv[1:]
    runs, args = 5, []
    i = 0
    while i < len(argv):
        if argv[i] == "--runs":
            runs, i = int(argv[i + 1]), i + 2
        elif argv[i].startswith("--runs="):
            runs, i = int(argv[i].split("=", 1)[1]), i + 1
        else:
            args.append(argv[i])
            i += 1
    names = args or [
        "pair_tfidf_cosine",
        "docs_dsir_sample",
        "bpe_merges",
        "keyphrase_topk",
    ]

    import __spark_entry__ as entry_mod
    from entity_linking_spark.session import get_spark

    spark = get_spark(
        app_name="els-bench-subset",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, int(CPUS)),
    )
    qs = entry_mod.queries()
    walls: dict[str, list[float]] = {n: [] for n in names}
    for i in range(runs):
        entry_mod._MEMO.clear()
        spark.catalog.clearCache()
        for n in names:
            t0 = time.time()
            qs[n](spark, SF_DIR).count()
            walls[n].append(round(time.time() - t0, 3))
    out = {
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": int(CPUS),
        "runs": runs,
        "walls": walls,
        "medians": {n: round(statistics.median(v), 3) for n, v in walls.items()},
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
