"""A/B on-chip profile: final-sort key width + blend chunk size.

- int32 vs int16 tile key for the one stable final sort
- compact blend at chunk=128 vs 256 (tile 32)
"""
import os, sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
PACE = 0.5
W, H, N, TILE = 1296, 840, 1_000_000, 32

def timed(name, build_run, n_short=2, n_long=8):
    run_s, run_l = build_run(n_short), build_run(n_long)
    time.sleep(PACE); float(run_s())
    time.sleep(PACE); float(run_l())
    time.sleep(PACE); float(run_s())
    time.sleep(PACE)
    t0 = time.time(); float(run_s()); t_s = time.time() - t0
    time.sleep(PACE)
    t0 = time.time(); float(run_l()); t_l = time.time() - t0
    ms = max(t_l - t_s, 1e-9) / (n_long - n_short) * 1e3
    print(f"{name:46s} {ms:8.2f} ms", flush=True)
    return ms

def scan_of(fn, *args):
    def build_run(n):
        @jax.jit
        def run():
            def step(c, i):
                barred = jax.lax.optimization_barrier((i, *args))
                return c + fn(barred[0], *barred[1:]), None
            acc, _ = jax.lax.scan(step, 0.0, jnp.arange(n, dtype=jnp.int32))
            return acc
        return run
    return build_run

from autovfx_tpu.core import cameras as C
from autovfx_tpu.ops import binning, preprocess_pallas as PP, blend_pallas
from autovfx_tpu.utils.synthetic import make_garden_like

g = make_garden_like(N, extent=2.67)
cam0 = C.look_at_camera([2.6, 0.0, 1.4], [0,0,0.2], [0,0,1], fx=960.98, fy=963.15, width=W, height=H)
rows = jax.jit(PP.pack_scene_rows)(g)
n_pad = rows.shape[1]*128
time.sleep(PACE)
ps0 = jax.jit(lambda r: PP.preprocess_packed(r, n_pad, cam0, tile=TILE))(rows)
splats, feat = ps0.splats, ps0.feat
time.sleep(PACE)
live = int(jnp.sum(splats.tiles_touched))
k = binning.round_budget(live, slack=1.06)
print("live", live, "k", k, flush=True)
time.sleep(PACE)
b = jax.jit(lambda s: binning.bin_splats(s, W, H, k, tile=TILE, chunk=128, pad_mode="none"))(splats)

perm = jax.random.permutation(jax.random.PRNGKey(0), k)
tile_u = b.tile[perm]
gid_u = b.gid[perm]

def sort32(i, t, g2):
    ts, gs = jax.lax.sort((t, g2), num_keys=1)
    return (gs % 7).sum().astype(jnp.float32) + i * 0.0

def sort16(i, t, g2):
    ts, gs = jax.lax.sort((t.astype(jnp.int16), g2), num_keys=1)
    return (gs % 7).sum().astype(jnp.float32) + i * 0.0

timed("final sort int32 key + int32 payload", scan_of(sort32, tile_u, gid_u))
timed("final sort int16 key + int32 payload", scan_of(sort16, tile_u, gid_u))

# compact blend: chunk 128 vs 256 at tile 32
dummy = feat.shape[1] - 1
for CH in (128, 256):
    time.sleep(PACE)
    b2 = jax.jit(
        lambda s, _CH=CH: binning.bin_splats(
            s, W, H, k, tile=TILE, chunk=_CH, pad_mode="none"
        )
    )(splats)
    time.sleep(PACE)
    fd = jax.jit(
        lambda f, gid, _CH=CH: f[
            :, jnp.concatenate([gid, jnp.full((_CH,), dummy, jnp.int32)])
        ]
    )(feat, b2.gid)
    tx, ty = int(b2.num_tiles_x), int(b2.num_tiles_y)

    def bl(i, fd, s1, cnt, ch, _CH=CH, _tx=tx, _ty=ty):
        out = blend_pallas._blend_fwd_call(
            fd, s1, ch, _tx * _ty, _tx, TILE, _CH, algo="fast",
            tile_count=cnt,
        )
        return out[:, 0, :].sum() + i * 0.0

    timed(
        f"blend fast compact chunk={CH}",
        scan_of(bl, fd, b2.tile_start, b2.tile_count, b2.tile_chunks),
    )
