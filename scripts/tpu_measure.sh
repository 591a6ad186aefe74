#!/bin/bash
# Round-3 TPU measurement matrix: run when the axon tunnel is up.
# Results append to /tmp/tpu_results.log (one JSON line per config).
set -u
cd "$(dirname "$0")/.."
log=/tmp/tpu_results.log
run() {
  echo "### $*" >> "$log"
  timeout 1800 env "$@" python bench.py >> "$log" 2>&1
  echo >> "$log"
}
echo "==== $(date) ====" >> "$log"
# 0. pre-flight: small-scale Mosaic compile check of the experimental
# kernel variants (fails fast instead of burning the matrix)
run BENCH_MODE=view BENCH_GAUSSIANS=50000 BENCH_WIDTH=256 BENCH_HEIGHT=256 BENCH_FRAMES=2 AUTOVFX_BLEND_ALGO=linear
# (the r3 "rows" feature-gather experiment is gone: Mosaic requires
# lane-dim slices aligned to the 128-lane tiling — cannot compile)
# 1. headline (current defaults) + effects + physics
run BENCH_MODE=all
# 2. blend algo: linear-space v3 vs log-space fast
run BENCH_MODE=view AUTOVFX_BLEND_ALGO=linear
run BENCH_MODE=view AUTOVFX_BLEND_ALGO=fast
# 4. best-of combos on the edit headline
run BENCH_MODE=edit AUTOVFX_BLEND_ALGO=linear
# 5. BASELINE configs 2/3 evidence
run BENCH_MODE=train
run BENCH_MODE=sugar
tail -40 "$log"
