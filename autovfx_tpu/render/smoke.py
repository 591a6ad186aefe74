"""Smoke & fire: jitted grid fluid rendered as Gaussian volumes.

Parity target: the *used subset* of Blender's Mantaflow gas sim +
Infinigen flame shading (``all_rendering.py:1227-1457``: quick_smoke
domain above the object, keyframed fuel/inflow, dissolve + noise,
blackbody flame colors, 512-sample premultiplied fire pass consumed by
the compositor :294-302).

TPU-first: a semi-Lagrangian smoke solver (advect density/temperature/
velocity, buoyancy, dissipation, pressure projection via Jacobi) on a
fixed grid inside ``lax.scan`` — the whole clip simulates in one jit.
Each frame's density field converts to Gaussian volumes (one splat per
occupied cell) rendered by the SAME splat rasterizer: smoke as gray
absorbing splats, fire as emissive blackbody-colored splats that feed
the compositor's additive premultiplied pass.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.core.sh import rgb_to_sh


class SmokeConfig(NamedTuple):
    resolution: int = 48  # cells per axis
    buoyancy: float = 4.0
    dissipation: float = 0.985
    temperature_diff: float = 0.92
    inflow_density: float = 0.9
    inflow_temperature: float = 1.0
    # vorticity confinement (on by default — coarse-grid advection
    # damps the swirl Mantaflow keeps; all_rendering.py:1253 noise+swirl)
    vorticity: float = 2.0
    jacobi_iters: int = 20
    dt: float = 1.0 / 15.0
    with_fire: bool = False
    # display-time wavelet-ish noise (the Mantaflow "use_noise" up-res,
    # all_rendering.py:1250-1257): octaves of value noise modulate the
    # rendered density field
    noise_octaves: int = 2
    noise_strength: float = 0.7
    noise_scale: float = 0.22   # lattice period as a fraction of R
    # Blender dissolve (smoke_domain.use_dissolve_smoke, :1258-1260):
    # density fades out over ``dissolve_speed`` frames; 0 = off
    dissolve_speed: int = 0


class SmokeState(NamedTuple):
    density: jax.Array  # (R, R, R)
    temperature: jax.Array
    velocity: jax.Array  # (R, R, R, 3)


def init_state(cfg: SmokeConfig) -> SmokeState:
    r = cfg.resolution
    return SmokeState(
        density=jnp.zeros((r, r, r)),
        temperature=jnp.zeros((r, r, r)),
        velocity=jnp.zeros((r, r, r, 3)),
    )


def _sample(field, pos):
    """Trilinear sample of (R,R,R[,C]) at grid coords (R,R,R,3)."""
    r = field.shape[0]
    p = jnp.clip(pos, 0.0, r - 1.001)
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0
    i1 = jnp.minimum(i0 + 1, r - 1)

    c000 = field[i0[..., 0], i0[..., 1], i0[..., 2]]
    c100 = field[i1[..., 0], i0[..., 1], i0[..., 2]]
    c010 = field[i0[..., 0], i1[..., 1], i0[..., 2]]
    c110 = field[i1[..., 0], i1[..., 1], i0[..., 2]]
    c001 = field[i0[..., 0], i0[..., 1], i1[..., 2]]
    c101 = field[i1[..., 0], i0[..., 1], i1[..., 2]]
    c011 = field[i0[..., 0], i1[..., 1], i1[..., 2]]
    c111 = field[i1[..., 0], i1[..., 1], i1[..., 2]]
    fx = f[..., 0:1] if field.ndim == 4 else f[..., 0]
    fy = f[..., 1:2] if field.ndim == 4 else f[..., 1]
    fz = f[..., 2:3] if field.ndim == 4 else f[..., 2]
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def _grid_coords(r):
    ii = jnp.arange(r)
    gx, gy, gz = jnp.meshgrid(ii, ii, ii, indexing="ij")
    return jnp.stack([gx, gy, gz], -1).astype(jnp.float32)


def step(state: SmokeState, inflow_mask: jax.Array, cfg: SmokeConfig):
    """One solver step: advect → inflow → buoyancy → project."""
    r = cfg.resolution
    coords = _grid_coords(r)

    # semi-Lagrangian advection
    back = coords - cfg.dt * state.velocity * r
    density = _sample(state.density, back) * cfg.dissipation
    temp = _sample(state.temperature, back) * cfg.temperature_diff
    vel = _sample(state.velocity, back)

    # Blender-style dissolve: linear fade over dissolve_speed frames
    if cfg.dissolve_speed > 0:
        density = jnp.maximum(
            density - cfg.inflow_density / cfg.dissolve_speed, 0.0
        )

    # inflow (keyframed fuel region, all_rendering.py:1310-1360)
    density = jnp.maximum(density, inflow_mask * cfg.inflow_density)
    temp = jnp.maximum(temp, inflow_mask * cfg.inflow_temperature)

    # buoyancy along +z
    vel = vel.at[..., 2].add(cfg.dt * cfg.buoyancy * temp)

    # vorticity confinement (Fedkiw et al.): re-inject the swirl the
    # coarse semi-Lagrangian advection dissipates
    if cfg.vorticity > 0.0:
        def curl(v):
            dwy = jnp.gradient(v[..., 2], axis=1) - jnp.gradient(
                v[..., 1], axis=2
            )
            dwz = jnp.gradient(v[..., 0], axis=2) - jnp.gradient(
                v[..., 2], axis=0
            )
            dwx = jnp.gradient(v[..., 1], axis=0) - jnp.gradient(
                v[..., 0], axis=1
            )
            return jnp.stack([dwy, dwz, dwx], axis=-1)

        w = curl(vel)
        wmag = jnp.linalg.norm(w, axis=-1)
        eta = jnp.stack(
            [
                jnp.gradient(wmag, axis=0),
                jnp.gradient(wmag, axis=1),
                jnp.gradient(wmag, axis=2),
            ],
            axis=-1,
        )
        n_eta = eta / jnp.maximum(
            jnp.linalg.norm(eta, axis=-1, keepdims=True), 1e-6
        )
        f_conf = jnp.cross(n_eta, w)  # N̂ × ω
        vel = vel + cfg.dt * cfg.vorticity * f_conf

    # incompressibility: Jacobi pressure solve on divergence
    def div(v):
        dx = jnp.gradient(v[..., 0], axis=0)
        dy = jnp.gradient(v[..., 1], axis=1)
        dz = jnp.gradient(v[..., 2], axis=2)
        return dx + dy + dz

    d = div(vel)

    def jacobi(i, p):
        p_n = (
            jnp.roll(p, 1, 0) + jnp.roll(p, -1, 0)
            + jnp.roll(p, 1, 1) + jnp.roll(p, -1, 1)
            + jnp.roll(p, 1, 2) + jnp.roll(p, -1, 2)
            - d
        ) / 6.0
        return p_n

    p = jax.lax.fori_loop(0, cfg.jacobi_iters, jacobi, jnp.zeros_like(d))
    vel = vel - jnp.stack(
        [
            jnp.gradient(p, axis=0),
            jnp.gradient(p, axis=1),
            jnp.gradient(p, axis=2),
        ],
        axis=-1,
    )
    # closed boundaries: zero normal velocity at the domain faces
    vel = vel.at[0, :, :, 0].set(0.0).at[-1, :, :, 0].set(0.0)
    vel = vel.at[:, 0, :, 1].set(0.0).at[:, -1, :, 1].set(0.0)
    vel = vel.at[:, :, 0, 2].set(0.0).at[:, :, -1, 2].set(0.0)
    return SmokeState(density=density, temperature=temp, velocity=vel)


def _shift_zero_fill(field: jax.Array, s: jax.Array, axis: int):
    """Roll ``field`` by -s along ``axis`` with zero fill (no wrap).
    ``s`` is a traced int32 (|s| small); content moves toward lower
    indices when s > 0 — the domain origin moved UP by s cells."""
    r = field.shape[axis]
    rolled = jnp.roll(field, -s, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, field.shape, axis)
    keep = jnp.where(
        s >= 0, idx < r - s, idx >= -s
    )
    return jnp.where(keep, rolled, 0.0)


def simulate_smoke(
    cfg: SmokeConfig,
    inflow_mask: jax.Array,
    num_frames: int,
    inflow_frames: jax.Array | None = None,
    adaptive: bool = False,
    max_shift: int = 2,
):
    """Simulate the clip; returns stacked per-frame states (F, R, R, R...).

    ``inflow_frames``: optional (F,) bool — fuel on/off per frame (the
    keyframed fuel behavior / smoke events).

    ``adaptive=True`` is the TPU-first analog of Blender's adaptive
    domain (all_rendering.py:1271-1275): instead of growing the box
    (dynamic shapes), the fixed-resolution domain RECENTERS each frame
    toward the density centroid (≤ ``max_shift`` cells/frame/axis), so a
    rising plume never clips at the lid.  The world-fixed emitter mask
    shifts opposite to the cumulative offset.  Returns
    (SmokeState stacked, origin_cells (F, 3) int32) — add
    ``origin_cells[f] * cell`` to the domain origin when rendering
    frame f.
    """
    if inflow_frames is None:
        inflow_frames = jnp.ones((num_frames,), bool)

    if not adaptive:
        @jax.jit
        def run(state):
            def frame(state, on):
                state = step(
                    state, inflow_mask * on.astype(jnp.float32), cfg
                )
                return state, state

            _, traj = jax.lax.scan(frame, state, inflow_frames)
            return traj

        return run(init_state(cfg))

    r = cfg.resolution
    center = (r - 1) / 2.0
    coords = _grid_coords(r)

    @jax.jit
    def run_adaptive(state):
        def frame(carry, on):
            state, origin = carry  # origin: (3,) int32 cumulative cells
            # emitter is world-fixed: shift its mask into domain coords
            m = inflow_mask
            for ax in range(3):
                m = _shift_zero_fill(m, origin[ax], ax)
            state = step(state, m * on.astype(jnp.float32), cfg)
            # recenter toward the density centroid
            mass = jnp.maximum(jnp.sum(state.density), 1e-6)
            com = (
                jnp.sum(
                    state.density[..., None] * coords, axis=(0, 1, 2)
                )
                / mass
            )
            shift = jnp.clip(
                jnp.round(com - center).astype(jnp.int32),
                -max_shift, max_shift,
            )
            shift = jnp.where(mass > 1e-3, shift, 0)
            d, t, v = state.density, state.temperature, state.velocity
            for ax in range(3):
                d = _shift_zero_fill(d, shift[ax], ax)
                t = _shift_zero_fill(t, shift[ax], ax)
                v = _shift_zero_fill(v, shift[ax], ax)
            state = SmokeState(density=d, temperature=t, velocity=v)
            origin = origin + shift
            return (state, origin), (state, origin)

        (_, _), (traj, origins) = jax.lax.scan(
            frame, (state, jnp.zeros(3, jnp.int32)), inflow_frames
        )
        return traj, origins

    return run_adaptive(init_state(cfg))


def _lattice_hash(ix, iy, iz, seed):
    """Deterministic int32 lattice hash -> [0, 1) floats (jit-friendly)."""
    h = (
        ix * jnp.int32(374761393)
        + iy * jnp.int32(668265263)
        + iz * jnp.int32(1442695041)
        + jnp.int32(seed) * jnp.int32(974711)
    )
    h = jnp.bitwise_xor(h, h >> 13) * jnp.int32(1274126177)
    h = jnp.bitwise_xor(h, h >> 16)
    return (jnp.bitwise_and(h, 0xFFFF).astype(jnp.float32)) / 65535.0


def value_noise3(coords: jax.Array, period: float, seed: int) -> jax.Array:
    """Trilinear value noise in [0, 1] at (..., 3) grid coords."""
    p = coords / period
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0
    f = f * f * (3.0 - 2.0 * f)  # smoothstep fade

    def at(dx, dy, dz):
        return _lattice_hash(
            i0[..., 0] + dx, i0[..., 1] + dy, i0[..., 2] + dz, seed
        )

    c00 = at(0, 0, 0) * (1 - f[..., 0]) + at(1, 0, 0) * f[..., 0]
    c10 = at(0, 1, 0) * (1 - f[..., 0]) + at(1, 1, 0) * f[..., 0]
    c01 = at(0, 0, 1) * (1 - f[..., 0]) + at(1, 0, 1) * f[..., 0]
    c11 = at(0, 1, 1) * (1 - f[..., 0]) + at(1, 1, 1) * f[..., 0]
    c0 = c00 * (1 - f[..., 1]) + c10 * f[..., 1]
    c1 = c01 * (1 - f[..., 1]) + c11 * f[..., 1]
    return c0 * (1 - f[..., 2]) + c1 * f[..., 2]


def apply_density_noise(
    density: jax.Array, frame_idx, cfg: SmokeConfig
) -> jax.Array:
    """Display-time noise octaves on the density field (the Mantaflow
    wavelet-noise up-res analog, all_rendering.py:1250-1257): each
    octave halves the period and amplitude; the field scrolls upward
    with time so the detail advects with the plume."""
    if cfg.noise_octaves <= 0 or cfg.noise_strength <= 0.0:
        return density
    r = density.shape[0]
    coords = _grid_coords(r)
    # scroll against buoyant motion (cells/frame)
    drift = jnp.asarray(frame_idx, jnp.float32) * 0.35
    coords = coords.at[..., 2].add(-drift)
    n = jnp.zeros_like(density)
    amp_sum = 0.0
    period = cfg.noise_scale * r
    amp = 1.0
    for o in range(cfg.noise_octaves):
        n = n + amp * value_noise3(coords, period, seed=17 + o)
        amp_sum += amp
        amp *= 0.5
        period *= 0.5
    n = n / amp_sum  # [0, 1]
    mod = 1.0 + cfg.noise_strength * (2.0 * n - 1.0)
    return density * jnp.maximum(mod, 0.0)


def sphere_inflow(cfg: SmokeConfig, center_cell, radius_cells) -> jax.Array:
    coords = _grid_coords(cfg.resolution)
    d = jnp.linalg.norm(coords - jnp.asarray(center_cell), axis=-1)
    return (d < radius_cells).astype(jnp.float32)


def blackbody_rgb(temperature: jax.Array) -> jax.Array:
    """Cheap blackbody ramp 0..1 -> RGB (Infinigen-flame-ish)."""
    t = jnp.clip(temperature, 0.0, 1.0)[..., None]
    cold = jnp.array([0.6, 0.05, 0.0])
    mid = jnp.array([1.0, 0.45, 0.05])
    hot = jnp.array([1.0, 0.95, 0.7])
    return jnp.where(
        t < 0.5, cold + (mid - cold) * (2 * t), mid + (hot - mid) * (2 * t - 1)
    )


def smoke_to_gaussians(
    density: jax.Array,
    temperature: jax.Array,
    origin: np.ndarray,
    extent: float,
    max_splats: int = 40_000,
    density_threshold: float = 0.02,
    smoke_color: float = 0.35,
    with_fire: bool = False,
    fire_temp_threshold: float = 0.4,
) -> Gaussians:
    """One frame's fields -> renderable splats (fixed capacity, masked)."""
    r = density.shape[0]
    cell = extent / r
    coords = _grid_coords(r).reshape(-1, 3)
    dens = density.reshape(-1)
    temp = temperature.reshape(-1)

    # keep the max_splats densest cells (static shape)
    score = jnp.where(dens > density_threshold, dens, 0.0)
    top, idx = jax.lax.top_k(score, min(max_splats, dens.shape[0]))
    active = top > 0
    pos = origin[None] + (coords[idx] + 0.5) * cell
    d_sel = dens[idx]
    t_sel = temp[idx]

    alpha = jnp.clip(d_sel * 0.8, 0.0, 0.95)
    op_logit = jnp.log(jnp.maximum(alpha, 1e-5) / jnp.maximum(1 - alpha, 1e-5))
    if with_fire:
        fire = t_sel > fire_temp_threshold
        rgb = jnp.where(
            fire[:, None],
            blackbody_rgb(t_sel) * (1.0 + 2.0 * t_sel[:, None]),
            jnp.full((1, 3), smoke_color),
        )
    else:
        rgb = jnp.full((pos.shape[0], 3), smoke_color)

    n = pos.shape[0]
    return Gaussians(
        xyz=pos,
        sh_dc=rgb_to_sh(jnp.broadcast_to(rgb, (n, 3))),
        sh_rest=jnp.zeros((n, 15, 3), jnp.float32),
        log_scales=jnp.full((n, 3), jnp.log(cell * 0.9)),
        quats=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity_logit=op_logit,
        active=active,
    )


def smoke_fire_gaussians(
    density: jax.Array,
    temperature: jax.Array,
    origin: jax.Array,
    extent: float,
    max_splats: int | None = None,
    density_threshold: float = 0.02,
    smoke_color: float = 0.35,
    fire_temp_threshold: float = 0.4,
) -> tuple[Gaussians, Gaussians]:
    """One frame's fields -> (smoke, fire) splat sets for the fused
    single-pass renderer: smoke splats are gray absorbers blended in the
    merged depth-sorted pass; fire splats are emissive blackbody colors
    rendered separately and ADDED premultiplied (the compositor's fire
    contract, blend_all.py:294-302).  Both have static capacity.

    ``max_splats`` defaults to a resolution-aware budget (40k at 48³,
    scaling with the cell count's 2/3 power — plume occupancy is
    surface-like): a fixed cap would undersample finer grids."""
    r = density.shape[0]
    if max_splats is None:
        max_splats = min(int(40_000 * (r / 48.0) ** 2), 160_000)
    cell = extent / r
    coords = _grid_coords(r).reshape(-1, 3)
    dens = density.reshape(-1)
    temp = temperature.reshape(-1)

    score = jnp.where(dens > density_threshold, dens, 0.0)
    top, idx = jax.lax.top_k(score, min(max_splats, dens.shape[0]))
    active = top > 0
    pos = jnp.asarray(origin)[None] + (coords[idx] + 0.5) * cell
    d_sel = dens[idx]
    t_sel = temp[idx]
    fire = t_sel > fire_temp_threshold

    alpha = jnp.clip(d_sel * 0.8, 0.0, 0.95)
    op_logit = jnp.log(
        jnp.maximum(alpha, 1e-5) / jnp.maximum(1 - alpha, 1e-5)
    )
    n = pos.shape[0]
    base = dict(
        xyz=pos,
        sh_rest=jnp.zeros((n, 15, 3), jnp.float32),
        log_scales=jnp.full((n, 3), jnp.log(cell * 0.9)),
        quats=jnp.zeros((n, 4)).at[:, 0].set(1.0),
    )
    g_smoke = Gaussians(
        sh_dc=rgb_to_sh(jnp.full((n, 3), smoke_color)),
        opacity_logit=op_logit,
        active=active,
        **base,
    )
    fire_rgb = blackbody_rgb(t_sel) * (1.0 + 2.0 * t_sel[:, None])
    fire_alpha = jnp.clip(d_sel * 0.8, 0.0, 0.95) * fire.astype(
        jnp.float32
    )
    fire_logit = jnp.log(
        jnp.maximum(fire_alpha, 1e-5) / jnp.maximum(1 - fire_alpha, 1e-5)
    )
    g_fire = Gaussians(
        sh_dc=rgb_to_sh(fire_rgb),
        opacity_logit=fire_logit,
        active=active & fire,
        **base,
    )
    return g_smoke, g_fire
