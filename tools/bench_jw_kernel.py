"""Scoring-kernel scaling probe WITHOUT Spark.

Runs the exact Jaro-Winkler kernel (`scoring.jaro_winkler_py`) over the
same candidate-pair strings the Spark benchmark scores, in plain
multiprocessing at two process counts. This isolates the compute kernel
from the Spark-local-mode harness: if the kernel scales ~linearly here
while the single-JVM local[N] run does not, the efficiency loss is a
local-mode artifact (shared heap/GC/shuffle disk across simulated
executors), not a property of the scoring stage — on a real cluster each
executor is an isolated JVM+python worker set, which this probe models
more faithfully than local mode does.

    python tools/bench_jw_kernel.py 2 8
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT_DIR = os.environ.get("ELS_SCALING_INPUT", "/tmp/els_scaling_input")
N_CONVS = int(os.environ.get("ELS_SCORING_CONVS", "160000"))
SEED = 42
N_PAIRS = int(os.environ.get("ELS_KERNEL_PAIRS", "1000000"))
CHUNK = 125_000


def _load_pairs() -> list[tuple[str, str]]:
    import duckdb

    base = os.path.join(INPUT_DIR, f"scoring_{N_CONVS}_{SEED}")
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT ra.norm_text, rb.norm_text
        FROM read_parquet('{base}/pairs/*.parquet') p
        JOIN read_parquet('{base}/records/*.parquet') ra ON p.a_key = ra.rec_key
        JOIN read_parquet('{base}/records/*.parquet') rb ON p.b_key = rb.rec_key
        LIMIT {N_PAIRS}
        """
    ).fetchall()
    return rows


KERNEL = os.environ.get("ELS_KERNEL", "batch")  # batch (production) | scalar


def _score_chunk(chunk: list[tuple[str, str]]) -> float:
    if KERNEL == "batch":
        from entity_linking_spark.functions.jaro import jaro_winkler_batch

        return float(
            jaro_winkler_batch([a for a, _ in chunk], [b for _, b in chunk]).sum()
        )
    from entity_linking_spark.operators.scoring import jaro_winkler_py

    return sum(jaro_winkler_py(a or "", b or "") for a, b in chunk)


def main() -> int:
    levels = [int(a) for a in sys.argv[1:]] or [2, 8]
    pairs = _load_pairs()
    chunks = [pairs[i : i + CHUNK] for i in range(0, len(pairs), CHUNK)]
    results = {}
    for procs in levels:
        t0 = time.time()
        with mp.Pool(procs) as pool:
            sums = pool.map(_score_chunk, chunks)
        wall = round(time.time() - t0, 2)
        results[procs] = {
            "wall_s": wall,
            "pairs_per_sec": round(len(pairs) / wall, 1),
            "checksum": round(sum(sums), 3),
        }
        print(json.dumps({"procs": procs, **results[procs]}))
    if len(levels) == 2:
        lo, hi = sorted(levels)
        eff = (
            results[hi]["pairs_per_sec"]
            / results[lo]["pairs_per_sec"]
            / (hi / lo)
        )
        print(json.dumps({"kernel_efficiency": round(eff, 3), "levels": [lo, hi]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
