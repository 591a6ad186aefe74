"""Stage timing of the EDITED-frame extras at the bench operating point.

The novel-view pipeline is profiled by tpu_stage_profile.py; this file
times what the edited frame adds on top (bench MODE=edit, fused path):
surfel shade+pack, hull-projection object weight, shadow ratio map
(scale 1/2), composite multiply, and the full fused frame for
cross-checking.  Device-side scans + optimization_barrier, same
methodology as tpu_stage_profile.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache")
)
PACE = 0.5
W, H, N, TILE = 1296, 840, int(os.environ.get("N_GAUSS", 1_000_000)), 32
FRAMES = 8


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


def main():
    from autovfx_tpu.core import cameras as C
    from autovfx_tpu.core.quaternion import quat_to_rotmat
    from autovfx_tpu.ops.rasterize import RasterConfig
    from autovfx_tpu.physics import world as PW
    from autovfx_tpu.render import clip as CL
    from autovfx_tpu.render import meshsplat as MS
    from autovfx_tpu.render import shadow as RSH
    from autovfx_tpu.utils.synthetic import make_garden_like

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B

    g = make_garden_like(N, extent=2.67)
    cams = C.stack_cameras(
        [
            C.look_at_camera(
                [2.6 * np.cos(a), 2.6 * np.sin(a), 1.4], [0, 0, 0.2],
                [0, 0, 1], fx=960.98, fy=963.15, width=W, height=H,
            )
            for a in np.linspace(0, 2 * np.pi, FRAMES, endpoint=False)
        ]
    )
    world, corners = B._cube_world(FRAMES)
    _, pos, quat = PW.simulate(world, FRAMES)
    rots = np.asarray(
        quat_to_rotmat(jnp.asarray(quat.reshape(-1, 4)))
    ).reshape(FRAMES, -1, 3, 3)
    origin = pos - np.einsum("fbij,bj->fbi", rots, world.com_offsets)
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
         [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
         [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64
    )
    surf = MS.sample_mesh_surfels(corners, faces, num_samples=50_000)
    rng = np.random.RandomState(0)
    env = (0.4 + 0.6 * rng.rand(32, 64, 3)).astype(np.float32)
    inp = CL.build_clip_inputs(
        bg=g, cams=cams,
        objects=[{"scale": 1.0, "material": {"rgb": [0.8, 0.2, 0.2]}}],
        surfels=[surf],
        traj_pos=origin.astype(np.float32),
        traj_rot=rots.astype(np.float32),
        hull_shape=world.shape, env=env, num_lights=16, pack_rows=True,
    )
    cfg = RasterConfig(
        dup_budget=int(os.environ.get("BENCH_BUDGET", 2 ** 21)),
        backend="pallas", feature_pack="bf16", tile=TILE, chunk=128,
    )
    cam0 = C.index_camera(inp.cams, 0)

    # full fused frame (the bench headline body)
    def full(i):
        f = CL.render_edited_frame_fused(inp, i % FRAMES, cfg)
        return f.mean()
    timed("full fused edited frame", scan_of(full))

    # surfel shade + pack
    def shade(i):
        g_obj = CL.shaded_object_gaussians(inp, i % FRAMES, cam0)
        return g_obj.xyz.mean() + g_obj.sh_dc.mean()
    timed("surfel shade+pack (50k)", scan_of(shade))

    # hull object weight
    depth = jnp.full((H, W), 2.5, jnp.float32)
    planes_w = CL._world_hull_planes_at(inp, 0)

    def how(i, depth, planes_w):
        return RSH.hull_object_weight(
            cam0, depth, planes_w, inp.hull_mask, pad=0.02
        ).mean() + i * 0.0
    timed("hull_object_weight", scan_of(how, depth, planes_w))

    # shadow ratio at scale 1 / 2 / 4
    alpha = jnp.ones((H, W), jnp.float32)
    for sc in (1, 2, 4):
        def srm(i, depth, alpha, planes_w, _sc=sc):
            return RSH.shadow_ratio_map(
                cam0, depth, alpha, inp.light_dirs, inp.light_weights,
                planes_w, inp.hull_mask, scale=_sc,
            ).mean() + i * 0.0
        timed(f"shadow_ratio_map scale={sc} (16 lights)",
              scan_of(srm, depth, alpha, planes_w))

    # 8-light variant at scale 2
    def srm8(i, depth, alpha, planes_w):
        return RSH.shadow_ratio_map(
            cam0, depth, alpha, inp.light_dirs[:8],
            inp.light_weights[:8], planes_w, inp.hull_mask, scale=2,
        ).mean() + i * 0.0
    timed("shadow_ratio_map scale=2 (8 lights)",
          scan_of(srm8, depth, alpha, planes_w))


if __name__ == "__main__":
    main()
