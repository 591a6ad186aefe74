"""Image-based lighting: SH-9 irradiance + GGX-prefiltered specular.

Replaces the *used subset* of Cycles shading for inserted objects
(SURVEY §2.1 Blender row): a Principled-BSDF-ish model lit by the HDR
environment map — diffuse via the Ramamoorthi-Hanrahan 9-coefficient
irradiance SH, specular via the split-sum approximation (a prefiltered
GGX radiance mip chain + the Karis/Lazarov analytic environment-BRDF
fit).  ``is_mirror`` objects additionally reflect *scene content* via a
single ray-traced bounce against the scene mesh (reference path-traces
this: all_rendering.py:1019-1062 BSDF + mirror).  Materials follow the
edit IR ``Material`` fields (edit_utils.py:107-114: base color /
texture, roughness, metallic).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.render.envmap import (
    direction_to_uv,
    sample_envmap,
    uv_to_direction,
)


class Material(NamedTuple):
    base_color: jax.Array = None  # (3,)
    roughness: float = 0.5
    metallic: float = 0.0
    emission: Optional[jax.Array] = None


def envmap_sh9(env: np.ndarray) -> np.ndarray:
    """Host-side: project an equirect map onto 9 SH coefficients (per RGB)."""
    env = np.asarray(env, np.float32)
    h, w, _ = env.shape
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    dirs = np.asarray(
        uv_to_direction(jnp.asarray(np.stack([uu, vv], -1)))
    )  # (H, W, 3)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    basis = np.stack(
        [
            0.282095 * np.ones_like(x),
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3 * z * z - 1),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ],
        axis=-1,
    )  # (H, W, 9)
    sin_theta = np.sin(vv * np.pi)
    d_omega = (2 * np.pi / w) * (np.pi / h) * sin_theta
    sh = np.einsum("hwk,hwc,hw->kc", basis, env, d_omega)
    return sh.astype(np.float32)  # (9, 3)


_A = np.array(
    [np.pi, 2.094395, 2.094395, 2.094395, 0.785398, 0.785398, 0.785398,
     0.785398, 0.785398],
    np.float32,
)


def sh_irradiance(sh: jax.Array, normals: jax.Array) -> jax.Array:
    """Diffuse irradiance E(n)/π for normals (..., 3) from SH-9 (9, 3)."""
    x, y, z = normals[..., 0], normals[..., 1], normals[..., 2]
    basis = jnp.stack(
        [
            0.282095 * jnp.ones_like(x),
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3 * z * z - 1),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ],
        axis=-1,
    )
    a = jnp.asarray(_A)
    e = jnp.einsum("...k,k,kc->...c", basis, a, sh)
    return jnp.maximum(e / jnp.pi, 0.0)


def prefilter_envmap_ggx(
    env: np.ndarray,
    levels: int = 5,
    out_hw: tuple[int, int] = (128, 256),
    samples: int = 128,
) -> np.ndarray:
    """Host-side split-sum prefilter: GGX-convolved radiance stack.

    Level ``i`` stores the envmap convolved with the GGX NDF at
    roughness ``i/(levels-1)`` under the N=V=R assumption (the standard
    split-sum prefilter).  Returns (L, H, W, 3) float32; all levels at a
    common resolution so per-pixel trilinear lookup stays jit-friendly
    (``sample_envmap_stack``).
    """
    env_j = jnp.asarray(np.asarray(env, np.float32))
    h, w = out_hw
    uu, vv = np.meshgrid(
        (np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h
    )
    n = np.asarray(uv_to_direction(jnp.asarray(np.stack([uu, vv], -1))))
    n = n.reshape(-1, 3).astype(np.float32)  # (P, 3)

    # Hammersley 2D sequence
    i = np.arange(samples, dtype=np.uint32)
    bits = i.copy()
    bits = ((bits << 16) | (bits >> 16)) & 0xFFFFFFFF
    bits = (((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1))
    bits = (((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2))
    bits = (((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4))
    bits = (((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8))
    u2 = (bits & 0xFFFFFFFF).astype(np.float64) * 2.3283064365386963e-10
    u1 = (i + 0.5) / samples

    @jax.jit
    def _level(alpha):
        nj = jnp.asarray(n)
        up = jnp.where(
            jnp.abs(nj[:, 2:3]) < 0.999,
            jnp.array([0.0, 0.0, 1.0]),
            jnp.array([1.0, 0.0, 0.0]),
        )
        t = jnp.cross(up, nj)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
        b = jnp.cross(nj, t)
        phi = 2.0 * jnp.pi * jnp.asarray(u1, jnp.float32)
        a2 = alpha * alpha
        ct = jnp.sqrt(
            (1.0 - jnp.asarray(u2, jnp.float32))
            / (1.0 + (a2 - 1.0) * jnp.asarray(u2, jnp.float32))
        )
        st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
        # half vectors in each texel's tangent frame: (P, S, 3)
        hx = st * jnp.cos(phi)
        hy = st * jnp.sin(phi)
        hv = (
            hx[None, :, None] * t[:, None, :]
            + hy[None, :, None] * b[:, None, :]
            + ct[None, :, None] * nj[:, None, :]
        )
        # V = N: L = 2 (V·H) H − V
        vdh = jnp.sum(nj[:, None, :] * hv, axis=-1, keepdims=True)
        l = 2.0 * vdh * hv - nj[:, None, :]
        ndl = jnp.maximum(jnp.sum(nj[:, None, :] * l, axis=-1), 0.0)
        rad = sample_envmap(env_j, l)  # (P, S, 3)
        wsum = jnp.maximum(jnp.sum(ndl, axis=1, keepdims=True), 1e-6)
        return jnp.sum(rad * ndl[..., None], axis=1) / wsum[..., None].squeeze(1)

    out = []
    for li in range(levels):
        r = li / max(levels - 1, 1)
        if li == 0:
            # roughness 0 = mirror: plain resample of the env
            out.append(np.asarray(sample_envmap(env_j, jnp.asarray(n))))
        else:
            out.append(np.asarray(_level(jnp.float32(max(r * r, 1e-4)))))
    return np.stack(out).reshape(levels, h, w, 3).astype(np.float32)


def sample_envmap_stack(
    stack: jax.Array, dirs: jax.Array, roughness: jax.Array
) -> jax.Array:
    """Trilinear lookup in a (L, H, W, 3) prefiltered stack.

    ``roughness`` broadcasts against ``dirs[..., 0]``; per-pixel values
    are supported (the stack is flattened to (L·H, W, 3) and the level
    rides the row index, keeping the gather jit-friendly).
    """
    levels, h, w, _ = stack.shape
    flat = stack.reshape(levels * h, w, 3)
    rough = jnp.broadcast_to(jnp.asarray(roughness), dirs[..., 0].shape)
    f = jnp.clip(rough, 0.0, 1.0) * (levels - 1)
    l0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, levels - 1)
    l1 = jnp.minimum(l0 + 1, levels - 1)
    lw = (f - l0.astype(f.dtype))[..., None]

    uv = direction_to_uv(dirs)
    x = uv[..., 0] * w - 0.5
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0c = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1c = jnp.clip(y0c + 1, 0, h - 1)

    def bilerp(level):
        yo = level * h
        c00 = flat[yo + y0c, x0i]
        c01 = flat[yo + y0c, x1i]
        c10 = flat[yo + y1c, x0i]
        c11 = flat[yo + y1c, x1i]
        return (
            c00 * (1 - fx) * (1 - fy)
            + c01 * fx * (1 - fy)
            + c10 * (1 - fx) * fy
            + c11 * fx * fy
        )

    return bilerp(l0) * (1.0 - lw) + bilerp(l1) * lw


def env_brdf_approx(ndv: jax.Array, roughness: jax.Array):
    """Karis mobile analytic fit of the split-sum environment BRDF.

    Returns (A, B) with specular ≈ F0·A + B (Lazarov's polynomial,
    standing in for the reference's path-traced BSDF integral).
    """
    r = jnp.asarray(roughness)
    x = -1.0 * r + 1.0
    y = -0.0275 * r + 0.0425
    z = -0.572 * r + 1.04
    w = 0.022 * r - 0.04
    a004 = jnp.minimum(x * x, jnp.exp2(-9.28 * ndv)) * x + y
    return (-1.04 * a004 + z, 1.04 * a004 + w)


def mirror_scene_reflection(
    points: jax.Array,
    refl_dirs: jax.Array,
    tri_a: jax.Array,
    tri_b: jax.Array,
    tri_c: jax.Array,
    tri_color: jax.Array,
    env_sh: jax.Array,
    eps: float = 1e-3,
):
    """Single-bounce scene reflection for ``is_mirror`` materials.

    Casts reflection rays against the (decimated) scene mesh
    (ops/raymesh); hit faces return their albedo shaded Lambertianly by
    the envmap SH at the face normal — the one-bounce analog of the
    Cycles mirror in all_rendering.py:1019-1062.  Returns
    (radiance (R, 3), hit (R,) bool).
    """
    from autovfx_tpu.ops.raymesh import ray_mesh_first_hit

    origins = points + refl_dirs * eps
    t, tri_idx, hit = ray_mesh_first_hit(origins, refl_dirs, tri_a, tri_b, tri_c)
    fn = jnp.cross(tri_b - tri_a, tri_c - tri_a)
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-9)
    n_hit = fn[tri_idx]
    # orient toward the incoming ray
    n_hit = jnp.where(
        jnp.sum(n_hit * refl_dirs, -1, keepdims=True) > 0, -n_hit, n_hit
    )
    albedo = tri_color[tri_idx]
    rad = albedo * sh_irradiance(env_sh, n_hit)
    return jnp.where(hit[:, None], rad, 0.0), hit


def shade(
    normals: jax.Array,
    view_dirs: jax.Array,
    env: jax.Array,
    env_sh: jax.Array,
    base_color: jax.Array,
    roughness: jax.Array | float = 0.5,
    metallic: jax.Array | float = 0.0,
    emission: jax.Array | None = None,
    env_ggx: jax.Array | None = None,
    scene_spec: jax.Array | None = None,
    scene_spec_mask: jax.Array | None = None,
) -> jax.Array:
    """Per-point shading: albedo·E(n) + split-sum specular.

    normals/view_dirs (..., 3) unit (view_dirs point *toward* the
    surface); base_color (..., 3) or (3,).  With ``env_ggx`` (the
    ``prefilter_envmap_ggx`` stack) the specular term is the split-sum
    GGX integral; without it, a single mirror sample with the legacy
    crude roughness attenuation.  ``scene_spec``/``scene_spec_mask``
    override the reflected radiance where a mirror's scene-bounce ray
    hit geometry (``mirror_scene_reflection``).
    """
    n = normals
    v = -view_dirs  # outgoing
    ndv = jnp.maximum(jnp.sum(n * v, axis=-1, keepdims=True), 0.0)
    refl = 2.0 * ndv * n - v

    rough = jnp.asarray(roughness)
    metal = jnp.asarray(metallic)
    diffuse = base_color * sh_irradiance(env_sh, n)
    f0 = 0.04 * (1.0 - metal) + metal * base_color
    if env_ggx is not None:
        rough_b = jnp.broadcast_to(
            rough, refl[..., 0][..., None].shape
        )[..., 0]
        spec_env = sample_envmap_stack(env_ggx, refl, rough_b)
        if scene_spec is not None:
            spec_env = jnp.where(scene_spec_mask, scene_spec, spec_env)
        a, b = env_brdf_approx(ndv, rough)
        spec = spec_env * (f0 * a + b)
    else:
        spec_env = sample_envmap(env, refl)
        if scene_spec is not None:
            spec_env = jnp.where(scene_spec_mask, scene_spec, spec_env)
        fresnel = f0 + (1.0 - f0) * (1.0 - ndv) ** 5
        # crude roughness attenuation of the mirror sample
        spec = spec_env * fresnel * (1.0 - 0.85 * rough)
    out = diffuse * (1.0 - metal) + spec
    if emission is not None:
        out = out + emission
    return out
