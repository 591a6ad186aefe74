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
  if timeout 90 python -c "
import time, jax, jax.numpy as jnp
assert float(jnp.ones((256,256)).sum()) == 65536.0
# perf canary: the tunnel sometimes serves a DEGRADED device (r5:
# 0.21 FPS on a 44-FPS bench, RESOURCE_EXHAUSTED on toy renders).
# 100 bf16 2048^3 matmuls ~ 1.7 TFLOP ~ 10 ms on a healthy v5e;
# require the warm dispatch under 5 s wall through the tunnel.
x = jnp.ones((2048, 2048), jnp.bfloat16)
@jax.jit
def f(x):
    def step(c, _):
        return (c @ x) * 1e-3, None
    y, _ = jax.lax.scan(step, x, None, length=100)
    return y.sum()
float(f(x))
t0 = time.time(); float(f(x)); dt = time.time() - t0
assert dt < 5.0, f'degraded: {dt:.1f}s'
" >/dev/null 2>&1; then
    echo "[tpu_run] device alive+healthy after $(( $(date +%s) - start ))s" >&2
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
