"""A/B on-chip profile: padded vs pad-free compact binning.

Stages isolated in device-side scans with optimization_barrier (see
scripts/tpu_stage_profile.py).  r5 evidence behind the compact-mode
design notes in PERF.md.
"""
import os, sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
PACE = 0.5
W, H, N, TILE, CHUNK = 1296, 840, 1_000_000, 32, 128

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
from autovfx_tpu.ops import binning, preprocess_pallas as PP, projection, blend_pallas, blend_ref
from autovfx_tpu.utils.synthetic import make_garden_like

g = make_garden_like(N, extent=2.67)
cams = C.stack_cameras([C.look_at_camera([2.6*np.cos(a), 2.6*np.sin(a), 1.4],[0,0,0.2],[0,0,1],fx=960.98,fy=963.15,width=W,height=H) for a in np.linspace(0,2*np.pi,8,endpoint=False)])
cam0 = C.index_camera(cams, 0)
# budgets
@jax.jit
def live_count(g):
    s = projection.preprocess(g, cam0, tile=TILE)
    return jnp.sum(s.tiles_touched)
time.sleep(PACE)
live = int(live_count(g))
k_pad = binning.round_budget(live + 1066*CHUNK, slack=1.06)
k_cpt = binning.round_budget(live, slack=1.06)
print("live", live, "k_pad", k_pad, "k_cpt", k_cpt, flush=True)

rows = jax.jit(PP.pack_scene_rows)(g)
n_pad = rows.shape[1]*128
time.sleep(PACE)
ps0 = jax.jit(lambda rows: PP.preprocess_packed(rows, n_pad, cam0, tile=TILE))(rows)
splats, feat = ps0.splats, ps0.feat

def binf_pad(i, splats):
    b = binning.bin_splats(splats, W, H, k_pad, tile=TILE, chunk=CHUNK)
    return (b.gid % 7).sum().astype(jnp.float32) + i*0.0
def binf_cpt(i, splats):
    b = binning.bin_splats(splats, W, H, k_cpt, tile=TILE, chunk=CHUNK, pad_mode="none")
    return (b.gid % 7).sum().astype(jnp.float32) + i*0.0
timed("bin_splats padded", scan_of(binf_pad, splats))
timed("bin_splats compact", scan_of(binf_cpt, splats))

time.sleep(PACE)
b_pad = jax.jit(lambda s: binning.bin_splats(s, W, H, k_pad, tile=TILE, chunk=CHUNK))(splats)
time.sleep(PACE)
b_cpt = jax.jit(lambda s: binning.bin_splats(s, W, H, k_cpt, tile=TILE, chunk=CHUNK, pad_mode="none"))(splats)

def gath_pad(i, feat, gid):
    return feat[:, gid][0].sum() + i*0.0
dummy = feat.shape[1]-1
def gath_cpt(i, feat, gid):
    g2 = jnp.concatenate([gid, jnp.full((CHUNK,), dummy, jnp.int32)])
    return feat[:, g2][0].sum() + i*0.0
timed("gather padded (8 x K_pad)", scan_of(gath_pad, feat, b_pad.gid))
timed("gather compact (8 x K_cpt+128)", scan_of(gath_cpt, feat, b_cpt.gid))

time.sleep(PACE)
fd_pad = jax.jit(lambda f, gid: f[:, gid])(feat, b_pad.gid)
time.sleep(PACE)
fd_cpt = jax.jit(lambda f, gid: f[:, jnp.concatenate([gid, jnp.full((CHUNK,), dummy, jnp.int32)])])(feat, b_cpt.gid)
tx, ty = int(b_pad.num_tiles_x), int(b_pad.num_tiles_y)

def bl_pad(i, fd, start, chunks):
    out = blend_pallas._blend_fwd_call(fd, start, chunks, tx*ty, tx, TILE, CHUNK, algo="fast")
    return out[:,0,:].sum() + i*0.0
def bl_cpt(i, fd, start, count, chunks):
    out = blend_pallas._blend_fwd_call(fd, start, chunks, tx*ty, tx, TILE, CHUNK, algo="fast", tile_count=count)
    return out[:,0,:].sum() + i*0.0
timed("blend fast padded", scan_of(bl_pad, fd_pad, b_pad.tile_start, b_pad.tile_chunks))
timed("blend fast compact", scan_of(bl_cpt, fd_cpt, b_cpt.tile_start, b_cpt.tile_count, b_cpt.tile_chunks))
print("chunks padded", int(b_pad.tile_chunks.sum()), "compact", int(b_cpt.tile_chunks.sum()), flush=True)
