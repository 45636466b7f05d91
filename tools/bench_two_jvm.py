"""Executor-per-node scaling evidence: 2 × local[4] JVMs vs 1 × local[8].

VERDICT r4 stretch item 9. The end-to-end composite scaling number is
capped by a single-JVM memory-bandwidth wall (BENCH.md decomposition):
all Arrow scoring workers share one JVM heap + one socket's bandwidth.
A real cluster runs one executor JVM per node and does NOT share that
wall. This harness demonstrates the wall empirically on one box, with
the same total core count on both sides:

  * SINGLE:  one JVM, local[8], scores the full pair set.
  * SHARDED: two concurrent JVMs, local[4] each, pinned to disjoint
    4-core sets when `taskset` is available; each scores the pairs
    whose xxhash64(a_key||b_key) lands in its half. Union of the two
    halves == exactly the single run's work (the shard filter is a
    zero-shuffle scan predicate); combined wall = max(wall_a, wall_b).

If SHARDED beats SINGLE at equal cores, the residual end-to-end
inefficiency is the shared-JVM wall, not the plan — the executor-per-
node deployment recovers it. Scoring is the BASELINE.json metric's
named stage and is embarrassingly parallel over pairs, so sharding it
across processes is exactly what a 2-executor cluster would do after
the pair shuffle.

    python tools/bench_two_jvm.py            # orchestrate both sides
    python tools/bench_two_jvm.py worker 4 0 2   # (internal) one shard
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scoring import ensure_inputs  # noqa: E402  (same tools dir)


def worker(cpus: int, shard: int, n_shards: int) -> int:
    """Score one hash-shard of the pair set; print one JSON line."""
    _, r_path, p_path = ensure_inputs()

    from pyspark.sql import functions as F

    from entity_linking_spark.operators import scoring as S
    from entity_linking_spark.session import get_spark

    spark = get_spark(
        f"els-2jvm-{shard}-{n_shards}",
        master=f"local[{cpus}]",
        # same DATA-sized partitioning rule as bench_scoring, scaled to
        # the shard: the per-task pair count stays ~250k on both sides
        shuffle_partitions=max(4, 16 // n_shards),
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    records = spark.read.parquet(r_path)
    prs = spark.read.parquet(p_path)
    if n_shards > 1:
        prs = prs.filter(
            F.pmod(F.xxhash64(F.concat("a_key", "b_key")), F.lit(n_shards))
            == F.lit(shard)
        )
    n_pairs = prs.count()
    t0 = time.time()
    scored = S.scored_pairs(S.pair_features(prs, records), with_jw=True)
    row = scored.agg(
        F.sum(F.col("is_match").cast("long")).alias("edges"),
        F.sum("jw").alias("jw_sum"),
    ).collect()[0]
    wall = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "shard": shard,
                "n_shards": n_shards,
                "pairs": n_pairs,
                "edges": int(row["edges"] or 0),
                "wall_s": wall,
            }
        )
    )
    spark.stop()
    return 0


def _spawn(args: list[str], cpu_list: str | None) -> subprocess.Popen:
    cmd = [sys.executable, os.path.abspath(__file__), *args]
    if cpu_list and shutil.which("taskset"):
        cmd = ["taskset", "-c", cpu_list, *cmd]
    return subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True
    )


def _result(p: subprocess.Popen) -> dict:
    out, _ = p.communicate()
    last = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        return worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))

    ensure_inputs()  # build once so no worker pays it inside its wall
    # turns for the turns/sec normalization (footer read, no session)
    from bench_scoring import N_CONVS, SEED, _parquet_rows

    base = os.path.join(
        os.environ.get("ELS_SCALING_INPUT", "/tmp/els_scaling_input"),
        f"scoring_{N_CONVS}_{SEED}",
    )
    n_turns = _parquet_rows(os.path.join(base, "records"))

    # SINGLE: one 8-core JVM (pin to cores 0-7 so both sides see the
    # same physical cores)
    p = _spawn(["worker", "8", "0", "1"], "0-7")
    single = _result(p)

    # SHARDED: two 4-core JVMs on disjoint core sets, concurrently
    t0 = time.time()
    pa = _spawn(["worker", "4", "0", "2"], "0-3")
    pb = _spawn(["worker", "4", "1", "2"], "4-7")
    ra, rb = _result(pa), _result(pb)
    sharded_wall = round(max(ra["wall_s"], rb["wall_s"]), 2)
    spawn_wall = round(time.time() - t0, 2)

    out = {
        "turns": n_turns,
        "single_8core": single,
        "sharded_2x4core": {"a": ra, "b": rb, "wall_s": sharded_wall,
                            "incl_startup_s": spawn_wall},
        "pairs_check": single["pairs"] == ra["pairs"] + rb["pairs"],
        "edges_check": single["edges"] == ra["edges"] + rb["edges"],
        "tput_single": round(n_turns / single["wall_s"], 1),
        "tput_sharded": round(n_turns / sharded_wall, 1),
        "sharded_vs_single": round(single["wall_s"] / sharded_wall, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
