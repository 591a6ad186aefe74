"""Height-field liquid solve for melting objects.

Parity target: the reference melts objects through a Mantaflow LIQUID
domain (res 256, viscosity 2e-3, object inflow + scene-mesh effector,
``/root/reference/blender/all_rendering.py:1649-1817``) and exports
per-frame melted meshes (``:2575-2585``) that drive shadow hulls and
Gaussian re-association (``/root/reference/scene_representation.py:372-421``).

TPU-first replacement: a thin-film (lubrication) height-field solve on a
fixed 2D grid, run for the WHOLE clip inside one ``lax.scan``:

    ∂h/∂t = ∇·( (h³/3ν) ∇(h + b) ) + source

- ``h`` is the fluid thickness, ``b`` the scene bed height (top-down
  height map of the scene mesh — the Mantaflow effector's analog), so
  fluid flows downhill and around scene geometry.
- The update is in explicit flux form with donor-cell (upwind) depth and
  a flux limiter that never drains a cell negative → mass is conserved
  to machine precision on the closed domain.
- The melting object transfers volume into the fluid through a footprint
  source as the melt progress advances (bottom-up solid collapse, like
  the reference's shrinking inflow object).
- Surfels/splats ride the fluid as TRACERS advected by the
  depth-averaged velocity u = -(h²/3ν)∇η — melted points spread with the
  puddle instead of teleporting; un-melted points stay on the shrinking
  solid.
- Per-frame surface MESHES are triangulated from the height field for
  shadow hulls and replay (the per-frame melted-mesh export analog).

Everything except the final mesh triangulation is jit-compiled; the
solver state is (R, R) f32 fields — VPU-friendly elementwise stencils.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class LiquidConfig(NamedTuple):
    # thin-film height-field cells per axis (2D grid); 128 puts the
    # lateral sample density in the regime of the reference's Mantaflow
    # LIQUID domain at res 256 (all_rendering.py:1782) for the melt
    # films these sims produce
    resolution: int = 128
    viscosity: float = 2e-3       # kinematic-ish ν (reference: 2e-3)
    substeps: int = 16            # solver substeps per frame
    dt: float = 1.0 / 24.0        # frame time
    margin: float = 1.6           # domain half-extent / object radius
    min_depth: float = 1e-5       # dry-cell threshold


class MeltFrames(NamedTuple):
    """Per-frame solver outputs (leading axis F = frames)."""

    h: jax.Array            # (F, R, R) fluid thickness
    eta: jax.Array          # (F, R, R) free surface height (bed + h)
    tracer_pos: jax.Array   # (F, P, 3) surfel/splat tracer positions
    tracer_norm: jax.Array  # (F, P, 3) tracer normals (solid or surface)
    tracer_fluid: jax.Array  # (F, P) float 0/1 — tracer has melted
    volume: jax.Array       # (F,) total fluid volume (conservation check)


def _grad_x(f, inv_c):
    """Face-centered x-gradient, shape (R-1, R)."""
    return (f[1:, :] - f[:-1, :]) * inv_c


def _grad_y(f, inv_c):
    return (f[:, 1:] - f[:, :-1]) * inv_c


def _bilinear(field: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample (R, R) field at fractional grid coords xy (P, 2)."""
    r = field.shape[0]
    p = jnp.clip(xy, 0.0, r - 1.001)
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0
    i1 = jnp.minimum(i0 + 1, r - 1)
    c00 = field[i0[:, 0], i0[:, 1]]
    c10 = field[i1[:, 0], i0[:, 1]]
    c01 = field[i0[:, 0], i1[:, 1]]
    c11 = field[i1[:, 0], i1[:, 1]]
    c0 = c00 * (1 - f[:, 0]) + c10 * f[:, 0]
    c1 = c01 * (1 - f[:, 0]) + c11 * f[:, 0]
    return c0 * (1 - f[:, 1]) + c1 * f[:, 1]


def _substep(h, bed, source, cell, cfg: LiquidConfig):
    """One explicit thin-film update; returns (h_new, u_cell (R,R,2))."""
    dt = cfg.dt / cfg.substeps
    inv_c = 1.0 / cell
    h = h + source  # volume injection (already per-substep)
    eta = bed + h

    # face diffusivity from the DONOR (higher-η) side so dry cells can't
    # emit flux and wetting fronts advance monotonically
    def face_flux(axis):
        if axis == 0:
            deta = _grad_x(eta, inv_c)             # (R-1, R)
            h_lo, h_hi = h[:-1, :], h[1:, :]
        else:
            deta = _grad_y(eta, inv_c)             # (R, R-1)
            h_lo, h_hi = h[:, :-1], h[:, 1:]
        h_up = jnp.where(deta > 0, h_hi, h_lo)     # donor depth
        # clamp the diffusivity at the explicit stability limit: above
        # it the update oscillates and the (drain-)limited flux reverses
        # every substep, throttling the spread and piling fluid at the
        # source instead of flattening it
        d_stab = 0.9 * cell * cell / (4.0 * dt)
        d = jnp.minimum(h_up**3 / (3.0 * cfg.viscosity), d_stab)
        flux = d * deta                            # volume/length/time
        # limiter: a face may not drain more than donor's share of depth
        cap = h_up * cell / (4.0 * dt)
        return jnp.clip(flux, -cap, cap)

    fx = face_flux(0)   # (R-1, R) flux from cell i+1 -> i when positive
    fy = face_flux(1)
    div = jnp.zeros_like(h)
    div = div.at[:-1, :].add(fx).at[1:, :].add(-fx)
    div = div.at[:, :-1].add(fy).at[:, 1:].add(-fy)
    h_new = jnp.maximum(h + dt * inv_c * div, 0.0)

    # depth-averaged velocity at cell centers (for tracer advection):
    # positive face flux moves volume toward the LOWER index, so
    # u = -flux/h (u = -(h²/3ν)∇η in the continuum limit)
    ux = jnp.zeros_like(h).at[:-1, :].add(0.5 * fx).at[1:, :].add(0.5 * fx)
    uy = jnp.zeros_like(h).at[:, :-1].add(0.5 * fy).at[:, 1:].add(0.5 * fy)
    hd = jnp.maximum(h_new, cfg.min_depth)
    u = jnp.stack([-ux / hd, -uy / hd], axis=-1)  # (R, R, 2)
    return h_new, u


class MeltSim:
    """Whole-clip melt solve for one object (surfels or splat centers).

    ``points``/``normals``: object-space sample points (world scale,
    already posed). ``bed``: optional (R, R) scene height map over the
    domain (default: flat plane at ground_z). Use ``bed_from_mesh`` to
    build one from scene geometry.
    """

    def __init__(
        self,
        points: np.ndarray,
        normals: np.ndarray | None = None,
        ground_z: float | None = None,
        bed: np.ndarray | None = None,
        cfg: LiquidConfig = LiquidConfig(),
    ):
        pts = np.asarray(points, np.float32)
        self.cfg = cfg
        r = cfg.resolution
        center = pts[:, :2].mean(0)
        radius = float(
            np.max(np.linalg.norm(pts[:, :2] - center[None], axis=1))
        )
        radius = max(radius, 1e-3)
        self.extent = 2.0 * cfg.margin * radius
        self.origin = center - 0.5 * self.extent  # (2,)
        self.cell = self.extent / r
        if ground_z is None:
            ground_z = float(pts[:, 2].min())
        self.ground_z = ground_z
        if bed is None:
            bed = np.zeros((r, r), np.float32)
        self.bed = jnp.asarray(np.asarray(bed, np.float32))
        self.points = jnp.asarray(pts)
        self.normals = jnp.asarray(
            np.asarray(
                normals
                if normals is not None
                else np.tile([0, 0, 1.0], (len(pts), 1)),
                np.float32,
            )
        )
        # object volume estimate: footprint area × mean height
        h_obj = pts[:, 2] - ground_z
        self.height = float(max(h_obj.max(), 1e-4))
        cells = self._cell_of(pts)
        occ = np.zeros((r, r), np.float32)
        np.add.at(occ, (cells[:, 0], cells[:, 1]), 1.0)
        self.footprint = jnp.asarray((occ > 0).astype(np.float32))
        n_cells = float(max(np.sum(occ > 0), 1.0))
        self.volume = 0.6 * n_cells * self.cell**2 * self.height

    def _cell_of(self, pts: np.ndarray) -> np.ndarray:
        r = self.cfg.resolution
        gx = np.clip(
            (pts[:, 0] - self.origin[0]) / self.cell, 0, r - 1
        ).astype(np.int32)
        gy = np.clip(
            (pts[:, 1] - self.origin[1]) / self.cell, 0, r - 1
        ).astype(np.int32)
        return np.stack([gx, gy], -1)

    def run(self, progress: np.ndarray) -> MeltFrames:
        """Solve the clip. ``progress``: (F,) melt progress per frame
        (non-decreasing, in [0, 1])."""
        cfg = self.cfg
        r = cfg.resolution
        prog = jnp.asarray(np.asarray(progress, np.float32))
        dprog = prog - jnp.concatenate([jnp.zeros((1,)), prog[:-1]])
        foot_w = self.footprint / jnp.maximum(jnp.sum(self.footprint), 1.0)
        cell = self.cell
        origin = jnp.asarray(self.origin)
        pts0 = self.points
        nrm0 = self.normals
        h_rel = (pts0[:, 2] - self.ground_z) / self.height  # 0..1
        bed = self.bed

        @jax.jit
        def solve():
            def frame(carry, inp):
                h, txy = carry
                p_f, dp = inp
                # volume melted this frame, injected over the substeps
                src = (
                    dp
                    * self.volume
                    / cell**2
                    / cfg.substeps
                ) * foot_w

                def sub(c, _):
                    h, u = _substep(c[0], bed, src, cell, cfg)
                    # advect tracers (fractional grid coords)
                    uxy = jnp.stack(
                        [
                            _bilinear(u[..., 0], c[1]),
                            _bilinear(u[..., 1], c[1]),
                        ],
                        -1,
                    )
                    txy = c[1] + uxy * (cfg.dt / cfg.substeps) / cell
                    txy = jnp.clip(txy, 0.0, r - 1.001)
                    return (h, txy), None

                (h, txy), _ = jax.lax.scan(
                    sub, (h, txy), None, length=cfg.substeps
                )
                eta = bed + h

                # top-down melt: points above the solid top have melted
                melted = (h_rel > (1.0 - p_f) + 1e-6) | (p_f >= 1.0)
                melted_f = melted.astype(jnp.float32)
                z_solid = pts0[:, 2]  # un-melted points keep their pose
                # fluid part: ride the surface at the advected xy
                h_at = _bilinear(h, txy)
                eta_at = _bilinear(eta, txy)
                # eta is relative to the ground_z datum
                z_fluid = jnp.where(
                    h_at > cfg.min_depth,
                    self.ground_z + eta_at - 0.25 * h_at,
                    self.ground_z,
                )
                xy_solid = pts0[:, :2]
                xy_fluid = origin[None] + (txy + 0.5) * cell
                pos = jnp.concatenate(
                    [
                        jnp.where(
                            melted[:, None], xy_fluid, xy_solid
                        ),
                        jnp.where(melted, z_fluid, z_solid)[:, None],
                    ],
                    axis=-1,
                )
                # fluid normals from the free-surface gradient
                inv_c = 1.0 / cell
                gx = jnp.gradient(eta, axis=0) * inv_c
                gy = jnp.gradient(eta, axis=1) * inv_c
                nx = -_bilinear(gx, txy)
                ny = -_bilinear(gy, txy)
                n_fluid = jnp.stack([nx, ny, jnp.ones_like(nx)], -1)
                n_fluid = n_fluid / jnp.linalg.norm(
                    n_fluid, axis=-1, keepdims=True
                )
                nrm = jnp.where(melted[:, None], n_fluid, nrm0)
                vol = jnp.sum(h) * cell**2
                out = (h, eta, pos, nrm, melted_f, vol)
                return (h, txy), out

            txy0 = (pts0[:, :2] - origin[None]) / cell
            txy0 = jnp.clip(txy0, 0.0, r - 1.001)
            h0 = jnp.zeros((r, r), jnp.float32)
            _, outs = jax.lax.scan(
                frame, (h0, txy0), (prog, dprog)
            )
            return outs

        h, eta, pos, nrm, fluid, vol = solve()
        return MeltFrames(
            h=h, eta=eta, tracer_pos=pos, tracer_norm=nrm,
            tracer_fluid=fluid, volume=vol,
        )

    def frame_mesh(
        self, frames: MeltFrames, f: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Triangulate frame f's fluid surface (the per-frame melted-mesh
        export analog: all_rendering.py:2575-2585). Host-side; used for
        shadow hulls and replay, not per-pixel rendering."""
        cfg = self.cfg
        r = cfg.resolution
        h = np.asarray(frames.h[f])
        eta = np.asarray(frames.eta[f])
        wet = h > cfg.min_depth
        xs = self.origin[0] + (np.arange(r) + 0.5) * self.cell
        ys = self.origin[1] + (np.arange(r) + 0.5) * self.cell
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        verts = np.stack(
            [gx, gy, self.ground_z + eta], -1
        ).reshape(-1, 3)
        # quads where all 4 corners are wet
        quad = wet[:-1, :-1] & wet[1:, :-1] & wet[:-1, 1:] & wet[1:, 1:]
        qi, qj = np.nonzero(quad)
        if len(qi) == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
        v00 = qi * r + qj
        v10 = (qi + 1) * r + qj
        v01 = qi * r + (qj + 1)
        v11 = (qi + 1) * r + (qj + 1)
        faces = np.concatenate(
            [
                np.stack([v00, v10, v11], -1),
                np.stack([v00, v11, v01], -1),
            ],
            axis=0,
        )
        used = np.unique(faces)
        remap = np.full(verts.shape[0], -1, np.int64)
        remap[used] = np.arange(len(used))
        return (
            verts[used].astype(np.float32),
            remap[faces].astype(np.int64),
        )


def bed_from_mesh(
    scene_vertices: np.ndarray,
    scene_faces: np.ndarray,
    origin: np.ndarray,
    extent: float,
    resolution: int,
    ground_z: float = 0.0,
    z_top: float = 1e3,
) -> np.ndarray:
    """Top-down height map of the scene mesh over the melt domain (the
    Mantaflow scene-mesh effector analog) via the ray-mesh kernel.

    Heights are RELATIVE to ``ground_z`` (the solver's datum)."""
    from autovfx_tpu.ops.raymesh import ray_mesh_first_hit

    r = resolution
    cell = extent / r
    xs = origin[0] + (np.arange(r) + 0.5) * cell
    ys = origin[1] + (np.arange(r) + 0.5) * cell
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    origins = np.stack(
        [gx.ravel(), gy.ravel(), np.full(r * r, z_top, np.float32)], -1
    ).astype(np.float32)
    dirs = np.tile(np.array([0, 0, -1.0], np.float32), (r * r, 1))
    v = np.asarray(scene_vertices, np.float32)
    fidx = np.asarray(scene_faces)
    t, _, hit = ray_mesh_first_hit(
        jnp.asarray(origins), jnp.asarray(dirs),
        jnp.asarray(v[fidx[:, 0]]), jnp.asarray(v[fidx[:, 1]]),
        jnp.asarray(v[fidx[:, 2]]),
    )
    z_hit = z_top - np.asarray(t)
    z_hit = np.where(np.asarray(hit), z_hit, ground_z)
    return (z_hit - ground_z).reshape(r, r).astype(np.float32)


def apply_melt_to_gaussians(g, idx: np.ndarray, frames: MeltFrames,
                            f: int, cell: float):
    """Re-associate a 3DGS-extracted object's splats to the liquid
    state at frame ``f`` (reference: match_gaussians_to_mesh against the
    per-frame melted mesh, scene_representation.py:372-421).

    ``idx``: row indices of this object's (active) splats in ``g``; the
    MeltSim must have been built on ``g.xyz[idx]`` in the same order.
    Melted splats move with their tracers and flatten into the film
    (z-scale ~ half a grid cell); unmelted splats ride the shrinking
    solid.
    """
    pos = frames.tracer_pos[f]          # (P, 3)
    fluid = frames.tracer_fluid[f]      # (P,)
    xyz = g.xyz.at[jnp.asarray(idx)].set(pos)
    sc = g.log_scales[jnp.asarray(idx)]
    film_z = jnp.log(jnp.float32(max(cell * 0.4, 1e-5)))
    sc_melt = jnp.stack(
        [sc[:, 0], sc[:, 1], jnp.minimum(sc[:, 2], film_z)], axis=-1
    )
    sc_new = jnp.where(fluid[:, None] > 0.5, sc_melt, sc)
    log_scales = g.log_scales.at[jnp.asarray(idx)].set(sc_new)
    # melted splats lie in the film plane: snap orientation to identity
    quat_id = jnp.zeros_like(g.quats[jnp.asarray(idx)]).at[:, 0].set(1.0)
    q = jnp.where(
        fluid[:, None] > 0.5, quat_id, g.quats[jnp.asarray(idx)]
    )
    quats = g.quats.at[jnp.asarray(idx)].set(q)
    return g.replace(xyz=xyz, log_scales=log_scales, quats=quats)
