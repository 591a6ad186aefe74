#!/bin/bash
# Round-4 bisection of the INVALID_ARGUMENT TPU abort (BENCH_r03 + matrix
# pre-flights): small-scale view bench, one knob at a time, each in a
# fresh subprocess (TPU errors surface asynchronously, so attribution
# inside one process is unreliable).  Results append to /tmp/tpu_bisect.log.
set -u
cd "$(dirname "$0")/.."
log=/tmp/tpu_bisect.log
run() {
  echo "### $*" >> "$log"
  timeout 900 env BENCH_SKIP_PROBE=1 BENCH_MODE=view BENCH_GAUSSIANS=50000 \
    BENCH_WIDTH=256 BENCH_HEIGHT=256 BENCH_FRAMES=2 "$@" python bench.py \
    2>&1 | grep -E '^\{|Error' | tail -2 >> "$log"
  echo >> "$log"
}
echo "==== bisect $(date) ====" >> "$log"
run TAG=defaults_repro1
# stale persistent-compile-cache hypothesis: binaries cached in rounds
# 2/3 may predate an axon/libtpu update
mv ~/.jax_cache ~/.jax_cache.bak 2>/dev/null
run TAG=defaults_fresh_cache
run TAG=defaults_repro2
run AUTOVFX_COMPACT_PRESORT=0
run BENCH_FEATURE_PACK=f32
run AUTOVFX_BLEND_ALGO=log
run AUTOVFX_COMPACT_PRESORT=0 AUTOVFX_BLEND_ALGO=log
run AUTOVFX_COMPACT_PRESORT=0 BENCH_FEATURE_PACK=f32
tail -30 "$log"
