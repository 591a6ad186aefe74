"""Cycles-catcher shadow oracle: f64 dense-integration reference.

The reference composite consumes the Cycles shadow-catcher quotient
rgb_shadow / rgb_all (blend_all.py:279-292) — for a white diffuse
catcher lit by the envmap this is the cosine-weighted visibility

    ratio(p) = ∫ L(ω)·vis(p, ω)·cosθ⁺ dω / ∫ L(ω)·cosθ⁺ dω .

This file makes that parity claim *numerical*: an independent float64
reference integrates the full envmap texel grid against an independent
ray-AABB slab test, and the production estimator
(``importance_directions(up=+z)`` + ``ray_hits_hull`` /
``shadow_ratio_map``) must match within documented Monte-Carlo bounds.
Measured on the synthetic sun+sky HDR below (box occluder, 33×33 ground
grid):

    K=16  stratified+cos:  mean|e| ≈ 0.02,  max|e| ≈ 0.22  (penumbra)
    K=64  stratified+cos:  mean|e| ≈ 0.01,  max|e| ≈ 0.10
    luminance-only lights (no cosine) plateau at max|e| ≈ 0.18
    regardless of K — the catcher cosine is a real model term.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from autovfx_tpu.render.envmap import importance_directions, uv_to_direction
from autovfx_tpu.render.shadow import ray_hits_hull, shadow_ratio_map

H, W = 32, 64
BOX_LO = np.array([-0.5, -0.5, 0.4])
BOX_HI = np.array([0.5, 0.5, 1.4])


def synthetic_hdr() -> np.ndarray:
    """Sun blob + weaker sky blob over a graded sky — all above the
    horizon so the hemisphere carries nearly all the energy."""
    u = (np.arange(W) + 0.5) / W
    v = (np.arange(H) + 0.5) / H
    uu, vv = np.meshgrid(u, v)
    env = np.zeros((H, W, 3))
    env[..., 0] = 0.25
    env[..., 1] = 0.3
    env[..., 2] = 0.4 + 0.3 * (1 - vv)

    def blob(cu, cv, s, amp):
        return amp * np.exp(
            -((uu - cu) ** 2 + (vv - cv) ** 2) / (2 * s * s)
        )

    sun = blob(0.3, 0.25, 0.02, 400.0)
    env[..., 0] += sun
    env[..., 1] += 0.9 * sun
    env[..., 2] += 0.7 * sun
    env += blob(0.75, 0.35, 0.05, 30.0)[..., None] * np.array(
        [0.2, 0.4, 1.0]
    )
    return env.astype(np.float32)


def texel_grid():
    """(H*W, 3) f64 texel directions + (H*W,) solid angles."""
    u = (np.arange(W) + 0.5) / W
    v = (np.arange(H) + 0.5) / H
    uu, vv = np.meshgrid(u, v)
    dirs = np.asarray(
        uv_to_direction(jnp.asarray(np.stack([uu, vv], -1), jnp.float32))
    ).astype(np.float64)
    d_omega = (2 * np.pi / W) * (np.pi / H) * np.sin(vv * np.pi)
    return dirs.reshape(-1, 3), d_omega.reshape(-1)


def ray_box_visible(origins: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """(P, D) bool — independent f64 slab test against the AABB
    (deliberately NOT the library's hull-plane formulation)."""
    with np.errstate(divide="ignore"):
        inv = 1.0 / np.where(np.abs(dirs) > 1e-12, dirs, 1e-12)
    t0 = (BOX_LO[None, None] - origins[:, None]) * inv[None]
    t1 = (BOX_HI[None, None] - origins[:, None]) * inv[None]
    tmin = np.minimum(t0, t1).max(-1)
    tmax = np.maximum(t0, t1).min(-1)
    hit = (tmax > np.maximum(tmin, 1e-6)) & (tmax > 0)
    return ~hit


def box_hull_planes():
    planes = np.zeros((6, 4), np.float32)
    n = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
         [0, 0, -1]],
        np.float32,
    )
    d = np.array(
        [BOX_HI[0], -BOX_LO[0], BOX_HI[1], -BOX_LO[1], BOX_HI[2],
         -BOX_LO[2]],
        np.float32,
    )
    planes[:, :3] = n
    planes[:, 3] = d
    return jnp.asarray(planes), jnp.ones((6,), bool)


def ground_points(n: int = 33, extent: float = 2.0) -> np.ndarray:
    g = np.linspace(-extent, extent, n)
    gx, gy = np.meshgrid(g, g)
    return np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(-1, 3)


def dense_reference(env: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """f64 cosine-weighted dense integral over every envmap texel."""
    dirs, d_omega = texel_grid()
    lum = env.astype(np.float64).sum(-1).reshape(-1)
    wgt = lum * np.maximum(dirs[:, 2], 0.0) * d_omega  # (D,)
    keep = wgt > 1e-12 * wgt.max()
    vis = ray_box_visible(pts, dirs[keep])  # (P, D')
    return (vis * wgt[keep][None]).sum(-1) / wgt[keep].sum()


@pytest.fixture(scope="module")
def scene():
    env = synthetic_hdr()
    pts = ground_points()
    ref = dense_reference(env, pts)
    return env, pts, ref


class TestShadowEstimatorOracle:
    def _estimate(self, env, pts, num, seed=0):
        dirs, contrib = importance_directions(
            env, num, seed=seed, up=np.array([0.0, 0.0, 1.0]),
            stratified=True,
        )
        w = contrib.sum(-1).astype(np.float64)
        planes, mask = box_hull_planes()
        # (P, K) occlusion through the library slab test
        hits = np.asarray(
            ray_hits_hull(
                jnp.asarray(pts[:, None, :], jnp.float32),
                jnp.asarray(dirs)[None, :, :],
                planes,
                mask,
            )
        )
        return ((1.0 - hits) * w[None]).sum(-1) / w.sum()

    def test_k64_matches_dense_reference(self, scene):
        env, pts, ref = scene
        est = self._estimate(env, pts, 64)
        err = np.abs(est - ref)
        assert err.mean() < 0.03, err.mean()
        assert err.max() < 0.15, err.max()

    def test_k16_documented_bound(self, scene):
        env, pts, ref = scene
        est = self._estimate(env, pts, 16)
        err = np.abs(est - ref)
        assert err.mean() < 0.06, err.mean()
        assert err.max() < 0.35, err.max()

    def test_error_shrinks_with_k(self, scene):
        env, pts, ref = scene
        e16 = np.abs(self._estimate(env, pts, 16) - ref).mean()
        e128 = np.abs(self._estimate(env, pts, 128) - ref).mean()
        assert e128 < e16

    def test_cosine_contrib_integral(self):
        # constant env: Σ contrib must be the cosine-weighted integral
        # π·L (vs 4π·L for the full-sphere luminance-only mode)
        env = np.full((16, 32, 3), 2.0, np.float32)
        _, contrib = importance_directions(
            env, 256, up=np.array([0.0, 0.0, 1.0]), stratified=True
        )
        np.testing.assert_allclose(
            contrib.sum(0), np.pi * 2.0, rtol=0.05
        )


class TestShadowMapOracle:
    """Image-level: the production ``shadow_ratio_map`` pass (camera
    backprojection + per-light scan) against the dense f64 reference
    evaluated at the same surface points."""

    def test_overhead_camera_map(self, scene):
        from autovfx_tpu.core.cameras import look_at_camera

        env, _, _ = scene
        hpx, wpx = 24, 32
        cam = look_at_camera(
            [0.0, 1e-4, 6.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0],
            fx=40.0, fy=40.0, width=wpx, height=hpx,
        )
        depth = jnp.full((hpx, wpx), 6.0)  # flat ground at z=0
        alpha = jnp.ones((hpx, wpx))
        dirs, contrib = importance_directions(
            env, 64, up=np.array([0.0, 0.0, 1.0]), stratified=True
        )
        planes, mask = box_hull_planes()
        ratio = np.asarray(
            shadow_ratio_map(
                cam, depth, alpha,
                jnp.asarray(dirs), jnp.asarray(contrib.sum(-1)),
                planes[None], mask[None], bias=1e-3,
            )
        )
        rays = np.asarray(cam.ray_directions())
        pts = np.asarray(cam.center)[None, None] + rays * 6.0
        pts = pts.reshape(-1, 3)
        pts[:, 2] = 0.0
        ref = dense_reference(env, pts).reshape(hpx, wpx)
        err = np.abs(ratio - ref)
        # slightly looser than the point oracle: the pass adds a ray
        # bias offset toward the camera before the visibility test
        assert err.mean() < 0.04, err.mean()
        assert err.max() < 0.2, err.max()
