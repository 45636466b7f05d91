#!/bin/sh
# Strictly-sequential scaling pairs (VERDICT r3 item 7): N_PAIRS
# adjacent (2-core, 8-core) runs per track on an otherwise-idle box,
# fresh JVM per run, byte-identical parquet input per track. The
# per-pair efficiency = (tput@8 / tput@2) / 4; BASELINE.md publishes
# the MEDIAN pairing per track (same medians discipline as bench.py).
#
# Protocol controls (both learned from the first r4 sample set):
#   * the page cache is warmed over the input parquet before EVERY
#     timed run — otherwise the first (2-core) run of the day pays the
#     cold-disk read and inflates its pair's ratio while later 2-core
#     runs don't (observed: 433s cold vs 370s warm at the same level);
#   * the isolated scoring corpus is sized so the 8-core window is
#     ~60s+ (ELS_SCORING_CONVS=120000 → ~6M pairs): at the old 40k/2M
#     setting the 8-core window was ~26s and fixed costs (python-worker
#     startup, shuffle setup) ate ~20% of it — the "small data inverts
#     scaling" lesson in BENCH.md applied to the measurement itself.
#
#   sh tools/run_scaling_pairs.sh [n_pairs] >> /tmp/scaling_pairs.log
set -e
N=${1:-3}
cd "$(dirname "$0")/.."
export ELS_SCORING_CONVS=${ELS_SCORING_CONVS:-120000}

warm() {
  # pull every parquet byte under $1 into the page cache
  [ -d "$1" ] && find "$1" -type f -exec cat {} + > /dev/null 2>&1 || true
}

i=1
while [ "$i" -le "$N" ]; do
  warm /tmp/els_scaling_input
  echo "PAIR $i scoring lo"; python tools/bench_scoring.py 2
  warm /tmp/els_scaling_input
  echo "PAIR $i scoring hi"; python tools/bench_scoring.py 8
  i=$((i + 1))
done
i=1
while [ "$i" -le "$N" ]; do
  warm /tmp/els_scaling_input
  echo "PAIR $i e2e lo"; python tools/bench_scaling.py 2
  warm /tmp/els_scaling_input
  echo "PAIR $i e2e hi"; python tools/bench_scaling.py 8
  i=$((i + 1))
done
