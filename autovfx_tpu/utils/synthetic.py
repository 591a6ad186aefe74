"""Procedural test scenes (no dataset dependency).

The reference pipeline assumes the Mip-NeRF-360 Garden capture; for unit
tests and benchmarks we build synthetic splat clouds with matching
statistics (millions of anisotropic Gaussians, SH degree 3, a ground
plane + clutter) so every component can run hermetically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from autovfx_tpu.core.cameras import Camera, look_at_camera
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.core.quaternion import quat_normalize
from autovfx_tpu.core.sh import rgb_to_sh


def make_gaussians(
    n: int,
    key: jax.Array,
    spread: float = 1.0,
    scale_range: tuple[float, float] = (0.01, 0.08),
    sh_degree: int = 3,
    opacity_range: tuple[float, float] = (0.2, 0.95),
) -> Gaussians:
    ks = jax.random.split(key, 6)
    xyz = jax.random.normal(ks[0], (n, 3)) * spread
    rgb = jax.random.uniform(ks[1], (n, 3))
    k = (sh_degree + 1) ** 2
    sh_rest = 0.05 * jax.random.normal(ks[2], (n, k - 1, 3))
    log_s = jnp.log(
        jax.random.uniform(
            ks[3], (n, 3), minval=scale_range[0], maxval=scale_range[1]
        )
    )
    quats = quat_normalize(jax.random.normal(ks[4], (n, 4)))
    op = jax.random.uniform(
        ks[5], (n,), minval=opacity_range[0], maxval=opacity_range[1]
    )
    return Gaussians(
        xyz=xyz,
        sh_dc=rgb_to_sh(rgb),
        sh_rest=sh_rest,
        log_scales=log_s,
        quats=quats,
        opacity_logit=jnp.log(op / (1 - op)),
        active=jnp.ones((n,), bool),
    )


def make_scene(
    n: int = 1000,
    width: int = 64,
    height: int = 48,
    key: int | jax.Array = 0,
    fx: float | None = None,
    cam_dist: float = 4.0,
) -> tuple[Gaussians, Camera]:
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    g = make_gaussians(n, key)
    if fx is None:
        fx = 0.9 * width
    cam = look_at_camera(
        eye=[cam_dist, 0.6, 0.8],
        target=[0.0, 0.0, 0.0],
        up=[0.0, 0.0, 1.0],
        fx=fx,
        fy=fx,
        width=width,
        height=height,
    )
    return g, cam


def make_garden_like(
    n: int = 3_000_000, key: int = 0, extent: float = 3.0
) -> Gaussians:
    """A Garden-scale splat cloud: dense ground disc + clutter + far shell.

    Matches the operating point in BASELINE.md (millions of splats at
    1296x840) for throughput benchmarking without the dataset.
    """
    k = jax.random.PRNGKey(key)
    k1, k2, k3, km = jax.random.split(k, 4)
    n_ground = n // 2
    n_mid = n // 3
    n_far = n - n_ground - n_mid

    g_ground = make_gaussians(
        n_ground, k1, spread=extent, scale_range=(0.004, 0.02)
    )
    g_ground = g_ground.replace(
        xyz=g_ground.xyz.at[:, 2].multiply(0.02)
    )
    g_mid = make_gaussians(n_mid, k2, spread=extent * 0.5,
                           scale_range=(0.004, 0.03))
    g_mid = g_mid.replace(xyz=g_mid.xyz + jnp.array([0.0, 0.0, 0.5]))
    g_far = make_gaussians(n_far, k3, spread=extent * 3.0,
                           scale_range=(0.05, 0.2))

    from autovfx_tpu.core.gaussians import merge

    return merge(merge(g_ground, g_mid), g_far)


def garden_camera(width: int = 1296, height: int = 840) -> Camera:
    """The Garden demo intrinsics (sample_custom_traj.py:126-132)."""
    scale = width / 1296.0
    return look_at_camera(
        eye=[2.2, 1.2, 1.6],
        target=[0.0, 0.0, 0.2],
        up=[0.0, 0.0, 1.0],
        fx=960.98 * scale,
        fy=963.15 * scale,
        width=width,
        height=height,
    )
