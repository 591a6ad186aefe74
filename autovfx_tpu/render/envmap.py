"""Equirectangular environment maps: sampling, rotation, sun extraction.

Parity targets:
- ``lighting/difflight.py:13-32`` — rotate the DiffusionLight equirect
  from camera frame to world using c2w with the axis remap [z, -x, -y].
- ``scene_representation.py:317-334`` — Waymo sun direction = direction
  of the brightest envmap pixel.
- ``lighting/diffusionlight/ball2envmap.py:54-100`` — the direction ↔
  equirect (u, v) convention: u = 0.5 + atan2(x? ...)/2π — we use the
  standard Blender/DiffusionLight mapping below.

The DiffusionLight network itself (SDXL inpainting) is an external
perception model consumed as a precomputed ``.exr``/``.npy`` input
behind the same wrapper API (see autovfx_tpu/perception).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def direction_to_uv(dirs: jax.Array) -> jax.Array:
    """Unit world directions (..., 3) -> equirect uv in [0,1]^2.

    Convention (Blender equirect, z-up): u wraps azimuth with -x at
    u=0.5 center, v=0 at the top (+z).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))  # 0..pi from +z
    phi = jnp.arctan2(-y, -x)  # Blender: center of map faces -x
    u = (phi / (2.0 * jnp.pi)) + 0.5
    v = theta / jnp.pi
    return jnp.stack([u, v], axis=-1)


def uv_to_direction(uv: jax.Array) -> jax.Array:
    u, v = uv[..., 0], uv[..., 1]
    theta = v * jnp.pi
    phi = (u - 0.5) * 2.0 * jnp.pi
    st = jnp.sin(theta)
    return jnp.stack(
        [-st * jnp.cos(phi), -st * jnp.sin(phi), jnp.cos(theta)], axis=-1
    )


def sample_envmap(env: jax.Array, dirs: jax.Array) -> jax.Array:
    """Bilinear sample an (H, W, 3) equirect map at directions (..., 3)."""
    h, w, _ = env.shape
    uv = direction_to_uv(dirs)
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = env[y0i, x0i]
    c01 = env[y0i, x1i]
    c10 = env[y1i, x0i]
    c11 = env[y1i, x1i]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def rotate_envmap_cam_to_world(env: jax.Array, c2w: jax.Array) -> jax.Array:
    """Re-orient a camera-frame equirect to world frame.

    Parity: difflight.py:13-32 — DiffusionLight's equirect is produced
    in the camera frame with axes [z, -x, -y]; world directions are
    pulled back through R = c2w[:3,:3] and the remap, then the map is
    resampled.
    """
    h, w, _ = env.shape
    uu, vv = jnp.meshgrid(
        (jnp.arange(w) + 0.5) / w, (jnp.arange(h) + 0.5) / h
    )
    dirs_world = uv_to_direction(jnp.stack([uu, vv], axis=-1))  # (H, W, 3)
    r = c2w[:3, :3]
    dirs_cam = dirs_world @ r  # world -> camera (R^T applied to rows)
    # camera-frame envmap axes: [z, -x, -y] (difflight.py:24-27)
    dirs_env = jnp.stack(
        [dirs_cam[..., 2], -dirs_cam[..., 0], -dirs_cam[..., 1]], axis=-1
    )
    return sample_envmap(env, dirs_env)


def sun_direction(env: jax.Array) -> jax.Array:
    """Direction of the brightest pixel (scene_representation.py:317-334)."""
    h, w, _ = env.shape
    lum = jnp.sum(env, axis=-1)
    idx = jnp.argmax(lum)
    y, x = idx // w, idx % w
    uv = jnp.stack([(x + 0.5) / w, (y + 0.5) / h])
    return uv_to_direction(uv)


def importance_directions(
    env: np.ndarray, num: int, seed: int = 0,
    up: np.ndarray | None = None, stratified: bool = False,
    dedup: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: luminance-importance-sampled light directions + weights.

    Used by the shadow-catcher pass to approximate the Cycles envmap
    integral with ``num`` rays.  Returns (dirs (num,3), radiance-weighted
    contributions (num,3) such that Σ contributions ≈ hemisphere-less
    full-sphere integral of env).

    With ``up`` (the scene up axis, +z after up-alignment): the sampling
    density AND the returned contributions carry the diffuse-catcher
    cosine factor max(dir·up, 0) — the shadow estimator
    Σ w·vis / Σ w then approximates the *Cycles white-catcher* ratio
    ∫L·vis·cosθ⁺ / ∫L·cosθ⁺ (rgb_shadow/rgb_all of the reference's
    5-pass loop; f64 dense-integration oracle in
    tests/test_shadow_oracle.py).  Σ contributions ≈ ∫L·cosθ⁺ dω (= πL
    for a constant env).  ``stratified`` replaces iid categorical draws
    with systematic (inverse-CDF) resampling — same estimator, lower
    variance at small ``num``.  ``dedup`` merges samples landing on the
    same texel (weights add): numerically the SAME estimator, but the
    returned arrays shrink to the unique-direction count — shadow-ray
    cost is linear in it (a sun-dominated env draws the sun texel many
    times).
    """
    env = np.asarray(env, np.float32)
    h, w, _ = env.shape
    v = (np.arange(h) + 0.5) / h
    sin_theta = np.sin(v * np.pi)[:, None]
    dens = env.sum(-1) * sin_theta  # solid-angle weighted luminance
    if up is not None:
        uu, vv = np.meshgrid((np.arange(w) + 0.5) / w, v)
        tex_dirs = np.asarray(
            uv_to_direction(jnp.asarray(np.stack([uu, vv], -1),
                                        jnp.float32))
        ).astype(np.float64)
        cos_up = np.maximum(tex_dirs @ np.asarray(up, np.float64), 0.0)
        dens = dens * cos_up.astype(np.float32)
    p = dens.reshape(-1) / dens.sum()
    rng = np.random.RandomState(seed)
    if stratified:
        cdf = np.cumsum(p)
        u = (np.arange(num) + rng.rand(num)) / num
        idx = np.minimum(np.searchsorted(cdf, u), len(p) - 1)
    else:
        idx = rng.choice(len(p), size=num, p=p)
    if dedup:
        idx, mult = np.unique(idx, return_counts=True)
    else:
        mult = np.ones(len(idx))
    ys, xs = idx // w, idx % w
    uv = np.stack([(xs + 0.5) / w, (ys + 0.5) / h], -1)
    dirs = np.asarray(uv_to_direction(jnp.asarray(uv)))
    # each sample's contribution: f / pdf / num, pdf in solid-angle
    # terms; f = L (or L·cosθ⁺ when ``up`` folds the catcher cosine)
    d_omega = (2 * np.pi / w) * (np.pi / h) * sin_theta.reshape(-1)[ys]
    pdf = p[idx] / np.maximum(d_omega, 1e-9)
    f = env.reshape(-1, 3)[idx]
    if up is not None:
        f = f * np.maximum(dirs @ np.asarray(up, np.float64), 0.0)[:, None]
    contrib = f * mult[:, None] / np.maximum(pdf[:, None], 1e-9) / num
    return dirs.astype(np.float32), contrib.astype(np.float32)


def load_envmap(path: str) -> np.ndarray:
    """Load an equirect envmap: .npy/.npz, .exr (via cv2/imageio), or LDR."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".npz"):
        z = np.load(path)
        return z[list(z.keys())[0]].astype(np.float32)
    if path.endswith(".exr") or path.endswith(".hdr"):
        try:
            import cv2

            img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
            return img[..., ::-1].astype(np.float32)
        except ImportError:
            import imageio.v2 as imageio

            return np.asarray(imageio.imread(path), np.float32)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img ** 2.2  # LDR -> approx linear
