"""Jitted edited-clip rendering: the whole video in one device program.

This is the production path for BASELINE config 4/5 throughput (the
reference renders each edited frame through a Blender subprocess at
minutes/frame; here physics replay, object shading, shadow rays and
compositing all run inside one ``lax.scan`` over frames).

Per frame (mirroring the reference's pass structure):
  1. background splat pass (color+depth+alpha),
  2. inserted objects as IBL-shaded surfels moved by the rb_transform
     trajectory, rasterized with the same kernel,
  3. envmap-visibility shadow ratio against the objects' hulls,
  4. the blend_all.py-parity composite.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera, index_camera
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.render import composite as RCOMP
from autovfx_tpu.render import ibl as RIBL
from autovfx_tpu.render import meshsplat as RMS
from autovfx_tpu.render import shadow as RSH


class ClipInputs(NamedTuple):
    """Static-shape inputs for the jitted clip loop."""

    bg: Gaussians
    cams: Camera  # stacked (F)
    # object surfels, concatenated over objects (S total samples)
    surf_points: jax.Array  # (S, 3) object-local
    surf_normals: jax.Array  # (S, 3)
    surf_colors: jax.Array  # (S, 3) albedo
    surf_radius: jax.Array  # (S,)
    surf_body: jax.Array  # (S,) int32 body index
    surf_rough: jax.Array  # (S,)
    surf_metal: jax.Array  # (S,)
    # per-frame rigid transforms (from rb_transform / physics)
    traj_pos: jax.Array  # (F, B, 3)
    traj_rot: jax.Array  # (F, B, 3, 3)
    traj_scale: jax.Array  # (B,)
    # hulls for shadows (body frame planes)
    hull_planes: jax.Array  # (B, Fh, 4)
    hull_mask: jax.Array  # (B, Fh)
    # lighting
    env: jax.Array  # (He, We, 3)
    env_sh: jax.Array  # (9, 3)
    light_dirs: jax.Array  # (L, 3)
    light_weights: jax.Array  # (L,)
    # optional: static field-major scene rows of ``bg`` for the fused
    # single-pass path (preprocess_pallas.pack_scene_rows)
    bg_rows: jax.Array | None = None
    # optional smoke/fire volume (whole-clip solver output): smoke
    # splats join the merged pass, fire renders separately and ADDS
    # premultiplied (blend_all.py:294-302)
    smoke_density: jax.Array | None = None  # (F, R, R, R)
    smoke_temp: jax.Array | None = None     # (F, R, R, R)
    smoke_origin: jax.Array | None = None   # (3,)
    smoke_extent: jax.Array | None = None   # () f32
    # per-frame adaptive-domain offsets in CELLS (simulate_smoke
    # adaptive=True); zeros when the domain is fixed
    smoke_origin_cells: jax.Array | None = None  # (F, 3) int32
    # optional liquid-melt tracer override: surfels with melt_mask take
    # their WORLD pose from melt_pos/melt_norm[frame] instead of the
    # rigid trajectory (render/liquid.py tracers)
    melt_pos: jax.Array | None = None       # (F, S, 3)
    melt_norm: jax.Array | None = None      # (F, S, 3)
    melt_mask: jax.Array | None = None      # (S,) bool
    # optional prefiltered GGX radiance stack (ibl.prefilter_envmap_ggx)
    # for split-sum specular in the fused shading
    env_ggx: jax.Array | None = None        # (L, He, We, 3)


def build_clip_inputs(
    bg: Gaussians,
    cams: Camera,
    objects: list,
    surfels: list,
    traj_pos: np.ndarray,
    traj_rot: np.ndarray,
    hull_shape,
    env: np.ndarray,
    num_lights: int = 32,
    pack_rows: bool = False,
    smoke_traj: tuple | None = None,
    melt: dict | None = None,
    with_ggx: bool = False,
) -> ClipInputs:
    """Host-side assembly (surfels: per-object dicts from
    meshsplat.sample_mesh_surfels, aligned with objects/trajectories)."""
    from autovfx_tpu.render.envmap import importance_directions

    pts, nrm, col, rad, body, rough, metal = [], [], [], [], [], [], []
    for i, (obj, s) in enumerate(zip(objects, surfels)):
        mat = obj.get("material") or {}
        base = mat.get("rgb")
        if mat.get("material_path"):
            from autovfx_tpu.render import materials as RMAT

            material = RMAT.load_material_folder(mat["material_path"])
            s = RMAT.apply_material_to_surfels(s, material)
            if base is not None:  # rgb + texture = hue-shift recolor
                s = dict(s)
                s["colors"] = RMAT.hue_shift_colors(s["colors"], base)
            base = None
        n = len(s["points"])
        c = s["colors"] if base is None else s["colors"] * np.asarray(base)
        pts.append(s["points"])
        nrm.append(s["normals"])
        col.append(c)
        rad.append(np.full(n, s["radius"], np.float32))
        body.append(np.full(n, i, np.int32))
        if "roughness" in s:
            rough.append(np.asarray(s["roughness"], np.float32))
        else:
            rough.append(
                np.full(n, float(mat.get("roughness", 0.5)), np.float32)
            )
        metal.append(
            np.full(
                n,
                1.0 if mat.get("is_mirror") else float(
                    mat.get("metallic", 0.0)
                ),
                np.float32,
            )
        )
    # catcher-cosine-folded stratified lights (+z = scene up after
    # up-alignment): the shadow ratio then estimates the Cycles
    # white-catcher quotient — see importance_directions / the f64
    # oracle in tests/test_shadow_oracle.py
    dirs, contrib = importance_directions(
        env, num_lights, up=np.array([0.0, 0.0, 1.0]), stratified=True,
        dedup=True,
    )
    hull_planes, hull_mask = RSH.trim_hull_planes(
        hull_shape.planes, hull_shape.plane_mask
    )
    bg_rows = None
    if pack_rows:
        from autovfx_tpu.ops import preprocess_pallas as PP

        bg_rows = jax.jit(PP.pack_scene_rows)(bg)
    smoke_kw = {}
    if smoke_traj is not None:
        # 4-tuple (fixed domain) or 5-tuple with per-frame adaptive
        # origin cells (scene_representation._smoke_trajectory)
        states, s_origin, s_extent, _s_cfg = smoke_traj[:4]
        origin_cells = (
            smoke_traj[4]
            if len(smoke_traj) > 4
            else np.zeros((states.density.shape[0], 3), np.int32)
        )
        smoke_kw = dict(
            smoke_density=jnp.asarray(states.density),
            smoke_temp=jnp.asarray(states.temperature),
            smoke_origin=jnp.asarray(s_origin, jnp.float32),
            smoke_extent=jnp.asarray(s_extent, jnp.float32),
            smoke_origin_cells=jnp.asarray(origin_cells, jnp.int32),
        )
    melt_kw = {}
    if melt is not None:
        melt_kw = dict(
            melt_pos=jnp.asarray(melt["pos"], jnp.float32),
            melt_norm=jnp.asarray(melt["norm"], jnp.float32),
            melt_mask=jnp.asarray(melt["mask"], bool),
        )
    ggx_kw = {}
    if with_ggx:
        ggx_kw = dict(
            env_ggx=jnp.asarray(RIBL.prefilter_envmap_ggx(env))
        )
    return ClipInputs(
        **smoke_kw,
        **melt_kw,
        **ggx_kw,
        bg=bg,
        bg_rows=bg_rows,
        cams=cams,
        surf_points=jnp.asarray(np.concatenate(pts)),
        surf_normals=jnp.asarray(np.concatenate(nrm)),
        surf_colors=jnp.asarray(np.concatenate(col).astype(np.float32)),
        surf_radius=jnp.asarray(np.concatenate(rad)),
        surf_body=jnp.asarray(np.concatenate(body)),
        surf_rough=jnp.asarray(np.concatenate(rough)),
        surf_metal=jnp.asarray(np.concatenate(metal)),
        traj_pos=jnp.asarray(traj_pos.astype(np.float32)),
        traj_rot=jnp.asarray(traj_rot.astype(np.float32)),
        traj_scale=jnp.asarray(
            np.array([float(o.get("scale", 1.0)) for o in objects],
                     np.float32)
        ),
        hull_planes=jnp.asarray(hull_planes),
        hull_mask=jnp.asarray(hull_mask),
        env=jnp.asarray(env.astype(np.float32)),
        env_sh=jnp.asarray(RIBL.envmap_sh9(env)),
        light_dirs=jnp.asarray(dirs),
        light_weights=jnp.asarray(contrib.sum(-1)),
    )


def shaded_object_gaussians(
    inp: ClipInputs, frame_idx, cam
) -> Gaussians:
    """IBL-shaded object surfels at this frame's rigid poses, as flat
    normal-aligned splats (shared by the multi-pass and fused paths)."""
    rot = inp.traj_rot[frame_idx]  # (B, 3, 3)
    pos = inp.traj_pos[frame_idx]  # (B, 3)
    s = inp.traj_scale[inp.surf_body][:, None]
    # scalarized rotation apply: XLA lowers batched (S, 3, 3) matmuls
    # ~10x slower than the expanded elementwise form (see
    # ops/projection.compute_cov3d)
    rb = rot[inp.surf_body]  # (S, 3, 3) gather of per-body rows
    p = inp.surf_points * s
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    nx, ny, nz = (
        inp.surf_normals[:, 0],
        inp.surf_normals[:, 1],
        inp.surf_normals[:, 2],
    )
    p_world = jnp.stack(
        [
            rb[:, 0, 0] * px + rb[:, 0, 1] * py + rb[:, 0, 2] * pz,
            rb[:, 1, 0] * px + rb[:, 1, 1] * py + rb[:, 1, 2] * pz,
            rb[:, 2, 0] * px + rb[:, 2, 1] * py + rb[:, 2, 2] * pz,
        ],
        axis=-1,
    ) + pos[inp.surf_body]
    n_world = jnp.stack(
        [
            rb[:, 0, 0] * nx + rb[:, 0, 1] * ny + rb[:, 0, 2] * nz,
            rb[:, 1, 0] * nx + rb[:, 1, 1] * ny + rb[:, 1, 2] * nz,
            rb[:, 2, 0] * nx + rb[:, 2, 1] * ny + rb[:, 2, 2] * nz,
        ],
        axis=-1,
    )
    if inp.melt_pos is not None:
        # liquid-melt tracers own the world pose of melting surfels
        m = inp.melt_mask[:, None]
        p_world = jnp.where(m, inp.melt_pos[frame_idx], p_world)
        n_world = jnp.where(m, inp.melt_norm[frame_idx], n_world)
    view = p_world - cam.center[None]
    view = view / jnp.maximum(
        jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-12
    )
    facing = jnp.sum(n_world * view, -1, keepdims=True)
    n_shade = jnp.where(facing > 0, -n_world, n_world)
    shaded = RIBL.shade(
        n_shade,
        view,
        inp.env,
        inp.env_sh,
        inp.surf_colors,
        roughness=inp.surf_rough[:, None],
        metallic=inp.surf_metal[:, None],
        env_ggx=inp.env_ggx,
    )
    g_obj = RMS.surfels_to_gaussians(p_world, n_shade, shaded, 1.0)
    # per-surfel radii (surfels_to_gaussians takes a scalar; fix up)
    scaled_r = inp.surf_radius * inp.traj_scale[inp.surf_body]
    return g_obj.replace(
        log_scales=jnp.log(
            jnp.stack([scaled_r, scaled_r, scaled_r * 0.1], axis=-1)
        )
    )


def _world_hull_planes_at(inp: ClipInputs, frame_idx) -> jax.Array:
    rot = inp.traj_rot[frame_idx]
    pos = inp.traj_pos[frame_idx]
    n_w = jnp.einsum("bij,bfj->bfi", rot, inp.hull_planes[..., :3])
    d_w = inp.hull_planes[..., 3] * inp.traj_scale[:, None] + jnp.einsum(
        "bfi,bi->bf", n_w, pos
    )
    return jnp.concatenate([n_w, d_w[..., None]], axis=-1)


def render_edited_frame(
    inp: ClipInputs, frame_idx, config: RasterConfig
) -> jax.Array:
    """One edited frame (jit-safe; frame_idx traced)."""
    cam = index_camera(inp.cams, frame_idx)

    # 1. background pass
    bg_out = rasterize(inp.bg, cam, config=config)
    bg_alpha = jnp.clip(bg_out.alpha, 0.0, 1.0)
    scene_depth = bg_out.depth / jnp.maximum(bg_alpha, 1e-6)
    scene_depth = jnp.where(bg_alpha > 0.01, scene_depth, 1e9)

    # 2. objects: transform surfels by this frame's rigid poses
    g_obj = shaded_object_gaussians(inp, frame_idx, cam)
    obj_out = rasterize(g_obj, cam, config=config)
    obj_alpha = obj_out.alpha
    obj_depth = obj_out.depth / jnp.maximum(obj_alpha, 1e-6)
    obj_depth = jnp.where(obj_alpha > 0.01, obj_depth, 1e9)

    # 3. shadow ratio against the objects' hulls at this frame's pose
    planes_w = _world_hull_planes_at(inp, frame_idx)
    ratio = RSH.shadow_ratio_map(
        cam,
        bg_out.depth,
        jnp.maximum(bg_alpha, 1e-3),
        inp.light_dirs,
        inp.light_weights,
        planes_w,
        inp.hull_mask,
    )

    # 4. composite
    frame = RCOMP.composite_frame(
        RCOMP.CompositeInputs(
            bg_color=bg_out.color,
            scene_depth=scene_depth,
            obj_color=obj_out.color,
            obj_alpha=obj_alpha,
            obj_depth=obj_depth,
            shadow_ratio=ratio,
            catcher_alpha=bg_alpha,
        )
    )
    return frame


def render_edited_frame_fused(
    inp: ClipInputs,
    frame_idx,
    config: RasterConfig,
    obj_dup_budget: int = 1 << 18,  # unused (kept for API stability)
    shadow_scale: int = 2,
    smoke_cfg=None,
) -> jax.Array:
    """One edited frame through ONE merged rasterization (fast path).

    Instead of separate full background/object passes + a binary
    depth_check composite (blend_all.py:249-307), the shaded object
    splats are spliced into the background's scene-rows layout and
    blended in a single pass — per-splat depth ordering resolves
    object↔scene occlusion exactly.  An analytic hull projection
    (shadow.hull_object_weight) recovers the per-pixel object weight so
    the shadow ratio darkens only the background contribution:

        frame = C · (1 − (1−ratio) · (1−w_obj) · α)

    which matches the compositor's catcher-weighted darkening on pure
    background pixels and leaves pure object pixels untouched; the
    approximation only differs inside the hull-silhouette band.

    Requires ``inp.bg_rows`` (build_clip_inputs(pack_rows=True)) and the
    Pallas bf16 backend.
    """
    from autovfx_tpu.ops import preprocess_pallas as PP
    from autovfx_tpu.ops.rasterize import rasterize, rasterize_rows_multi

    cam = index_camera(inp.cams, frame_idx)

    g_obj = shaded_object_gaussians(inp, frame_idx, cam)
    rows_list = [inp.bg_rows, PP.pack_scene_rows(g_obj)]
    g_fire = None
    if inp.smoke_density is not None:
        from autovfx_tpu.render import smoke as SMK

        if smoke_cfg is None:
            # noise defaults; pass the simulation's own SmokeConfig to
            # match render_smoke_pass exactly
            smoke_cfg = SMK.SmokeConfig()
        origin = inp.smoke_origin
        if inp.smoke_origin_cells is not None:
            # adaptive-domain recentering (cells -> world units)
            res = inp.smoke_density.shape[1]
            cell = inp.smoke_extent / res
            origin = origin + (
                inp.smoke_origin_cells[frame_idx].astype(jnp.float32)
                * cell
            )
        g_smoke, g_fire = SMK.smoke_fire_gaussians(
            SMK.apply_density_noise(
                inp.smoke_density[frame_idx], frame_idx, smoke_cfg
            ),
            inp.smoke_temp[frame_idx],
            origin,
            inp.smoke_extent,
        )
        rows_list.append(PP.pack_scene_rows(g_smoke))
    out = rasterize_rows_multi(rows_list, cam, config=config)

    alpha = jnp.clip(out.alpha, 0.0, 1.0)
    scene_depth = out.depth / jnp.maximum(alpha, 1e-6)
    scene_depth = jnp.where(alpha > 0.01, scene_depth, 1e9)

    planes_w = _world_hull_planes_at(inp, frame_idx)
    # object weight from hull projection against the merged surface —
    # replaces the object-only mini-rasterize (~100x cheaper; exact at
    # the hull silhouette, and shadows vanish smoothly there anyway)
    pad = 3.0 * jnp.mean(
        inp.surf_radius * inp.traj_scale[inp.surf_body]
    )
    w_obj = RSH.hull_object_weight(
        cam, scene_depth, planes_w, inp.hull_mask, pad=pad
    )
    ratio = RSH.shadow_ratio_map(
        cam,
        out.depth,
        jnp.maximum(alpha, 1e-3),
        inp.light_dirs,
        inp.light_weights,
        planes_w,
        inp.hull_mask,
        scale=shadow_scale,
    )
    ratio = jnp.clip(ratio, 0.0, 1.0)
    # compositor parity: only apply where a real shadow exists
    is_shadow = jnp.abs(ratio - 1.0) >= 0.01
    mult = 1.0 - (1.0 - ratio) * (1.0 - w_obj) * alpha
    mult = jnp.where(is_shadow, mult, 1.0)
    frame = out.color * mult[..., None]
    if g_fire is not None:
        # additive premultiplied fire pass (blend_all.py:294-302); the
        # emissive splats rasterize alone so occlusion by the merged
        # surface uses their own alpha, then C += fire premult
        fire_out = rasterize(
            g_fire, cam,
            config=config.replace(
                dup_budget=min(config.dup_budget, 1 << 18)
            ),
        )
        # fire_out.color over a black bg is already the premultiplied
        # radiance Σ T·α·c — add it directly (blend_all.py:300-302)
        frame = frame + fire_out.color
    return jnp.clip(frame, 0.0, 1.0)


def render_clip(
    inp: ClipInputs,
    num_frames: int,
    config: RasterConfig,
    fused: bool = False,
    supersample: int = 1,
    smoke_cfg=None,
) -> jax.Array:
    """(F, H, W, 3) edited frames, one jitted scan.

    ``supersample`` > 1 renders at an upscaled camera and box-filters
    down (the reference renders Blender passes at 2x and averages,
    all_rendering.py:2195-2209 / blend_all.py:21-28)."""
    if fused:
        frame_fn = functools.partial(
            render_edited_frame_fused, smoke_cfg=smoke_cfg
        )
    else:
        frame_fn = render_edited_frame
    if supersample > 1:
        inp = inp._replace(
            cams=inp.cams.replace(
                fx=inp.cams.fx * supersample,
                fy=inp.cams.fy * supersample,
                cx=inp.cams.cx * supersample,
                cy=inp.cams.cy * supersample,
                width=inp.cams.width * supersample,
                height=inp.cams.height * supersample,
            )
        )

    @jax.jit
    def run(inp):
        def frame(_, i):
            f = frame_fn(inp, i, config)
            for _ in range(max(supersample, 1).bit_length() - 1):
                from autovfx_tpu.render.composite import downsample2x

                f = downsample2x(f)
            return None, f

        _, frames = jax.lax.scan(frame, None, jnp.arange(num_frames))
        return frames

    return run(inp)
