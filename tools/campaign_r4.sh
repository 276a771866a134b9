#!/bin/bash
# Round-4 scaling campaign — the exact protocol behind BENCH.md §2.
#
# Reproduces the north-rule evidence: the SAME KG-construction job
# (phases 1-3 over a pages parquet) at two parallelism levels
# (local[2] vs local[8]) on three corpus sizes spanning 4x, with ONE
# fixed, level-independent configuration: shuffle partitions and input
# partitions both data-sized (= the corpus file count), never tuned
# per level.  Each cell is a fresh JVM (tools/scale_run.py) with a
# warm-up job excluded from the timed window.
#
# Corpora (deterministic, no external data) are generated with:
#   python -c "from kgspark.session import get_session;
#       from kgspark import datagen;
#       datagen.write_pages_distributed(get_session(), '/dev/shm/pages300k',
#                                       n_pages=300000, partitions=64)"
# (600k -> partitions=128, 1.2M -> partitions=256; seeds are per-page,
# so the corpus is byte-stable across runs and machines.)
#
# Superseded by tools/campaign_r5.sh (adds the 2.4M point, per-cell
# stderr logs, and a trial-start marker); kept as the round-4 record.
#
# Protocol notes (BENCH.md §2):
#  - run on an otherwise-idle box; host contention is strictly
#    additive, so publish raw trials AND the min per side across
#    trials as the uncontended-pair estimator;
#  - cheap cells first so a long 2-core run cannot starve the rest;
#  - 8->2 cores (not 32->8) per BENCH.md §4.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scale_r4_trial.jsonl}

run() { # cpus  data-sized-partitions  corpus-path
  KGSPARK_SHUFFLE_PARTITIONS=$2 KGSPARK_INPUT_PARTITIONS=$2 \
    python tools/scale_run.py "$1" "$3" 2>/dev/null >> "$OUT"
}

run 8 64  /dev/shm/pages300k
run 8 128 /dev/shm/pages600k
run 8 256 /dev/shm/pages1200k
run 2 64  /dev/shm/pages300k
run 2 128 /dev/shm/pages600k
run 2 256 /dev/shm/pages1200k
echo '{"campaign": "done"}' >> "$OUT"
