#!/bin/bash
# Round-5 scaling campaign — the protocol behind BENCH.md §2, extended
# with a fourth corpus doubling (2.4M pages, an 8x span end to end).
#
# Reproduces the north-rule evidence: the SAME KG-construction job
# (phases 1-3 over a pages parquet) at two parallelism levels
# (local[2] vs local[8]) on four corpus sizes spanning 8x, with ONE
# fixed, level-independent configuration: shuffle partitions and input
# partitions both data-sized (= the corpus file count), never tuned
# per level.  Each cell is a fresh JVM (tools/scale_run.py) with a
# warm-up job excluded from the timed window.
#
# Corpora (deterministic, no external data) are generated with:
#   python - <<'PY'
#   from kgspark.session import get_session
#   from kgspark import datagen
#   spark = get_session(master="local[32]", shuffle_partitions=32)
#   for n, parts in [(300_000, 64), (600_000, 128),
#                    (1_200_000, 256), (2_400_000, 512)]:
#       datagen.write_pages_distributed(
#           spark, f"/dev/shm/pages{n // 1000}k", n_pages=n,
#           partitions=parts)
#   PY
# (seeds are per-page, so each corpus is byte-stable across runs and
# machines; generation runs executor-side, so memory per task is one
# slice regardless of n_pages.)
#
# Protocol notes (BENCH.md §2):
#  - run on an otherwise-idle box; host contention is strictly
#    additive, so publish raw trials AND the min per side across
#    trials as the uncontended-pair estimator;
#  - cheap cells first so a long 2-core run cannot starve the rest;
#  - 8->2 cores (not 32->8) per BENCH.md §4.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scale_r5_trial.jsonl}
LOG="$OUT.log"

# Stamp each invocation so re-runs cannot silently blend trials from
# unrelated prior campaigns (different code trees) into one estimator
# input, and fail fast with a named missing corpus instead of dying
# mid-campaign with stderr discarded.
for c in 300k 600k 1200k 2400k; do
  [ -d "/dev/shm/pages$c" ] || {
    echo "missing corpus /dev/shm/pages$c — generate per the header" >&2
    exit 1
  }
done
echo "{\"trial_start\": \"$(date -u +%FT%TZ)\", \"git\": \"$(git rev-parse --short HEAD)\"}" >> "$OUT"

run() { # cpus  data-sized-partitions  corpus-path
  echo "=== cell: cpus=$1 parts=$2 corpus=$3 $(date -u +%FT%TZ)" >> "$LOG"
  KGSPARK_SHUFFLE_PARTITIONS=$2 KGSPARK_INPUT_PARTITIONS=$2 \
    python tools/scale_run.py "$1" "$3" 2>>"$LOG" >> "$OUT" \
    || { echo "cell failed: cpus=$1 corpus=$3 (see $LOG)" >&2; exit 1; }
}

run 8 64  /dev/shm/pages300k
run 8 128 /dev/shm/pages600k
run 8 256 /dev/shm/pages1200k
run 8 512 /dev/shm/pages2400k
run 2 64  /dev/shm/pages300k
run 2 128 /dev/shm/pages600k
run 2 256 /dev/shm/pages1200k
run 2 512 /dev/shm/pages2400k
echo '{"campaign": "done"}' >> "$OUT"
