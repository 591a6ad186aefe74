#!/bin/bash
# Wait until the axon TPU tunnel answers a trivial device op (fresh
# subprocess each probe — a hung in-process op is uninterruptible),
# then exec the given command with line-buffered output.
#
#   scripts/tpu_run.sh [max_wait_s] -- cmd args...
#
# The r5 tunnel shows multi-minute dead windows after a worker crash;
# probing from a fresh subprocess is the only reliable liveness signal.
set -u
MAX_WAIT=${1:-1800}
shift
[ "${1:-}" = "--" ] && shift
start=$(date +%s)
while true; do
  if timeout 45 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((256,256)).sum()) == 65536.0
" >/dev/null 2>&1; then
    echo "[tpu_run] device alive after $(( $(date +%s) - start ))s" >&2
    break
  fi
  now=$(date +%s)
  if [ $((now - start)) -ge "$MAX_WAIT" ]; then
    echo "[tpu_run] device still dead after ${MAX_WAIT}s — giving up" >&2
    exit 9
  fi
  echo "[tpu_run] device dead; retrying in 60s" >&2
  sleep 60
done
exec stdbuf -oL -eL "$@"
