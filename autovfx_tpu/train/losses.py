"""Training losses for 3DGS / SuGaR.

Parity target: ``sugar/gaussian_splatting/utils/loss_utils.py`` —
l1/l2 (:16-21), gaussian-window SSIM (:23-65), scale-shift-invariant
mono-depth loss (:67-116), mono-normal L1+0.1·cos (:118-132),
opacity mean (:134-141), sparsity (:143-150), anisotropic ratio clamp
(:152-168) — re-expressed as jnp with masked reductions instead of
boolean indexing (XLA static shapes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# ---- photometric -----------------------------------------------------------


def l1_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean((pred - gt) ** 2)


@functools.lru_cache(maxsize=None)
def _gaussian_window_np(window_size: int = 11, sigma: float = 1.5):
    import numpy as np

    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    # note: convert to jnp at call time — caching a traced constant
    # across jit scopes leaks tracers
    return jnp.asarray(_gaussian_window_np(window_size, sigma))


def _filter2d(img: jax.Array, window: jax.Array) -> jax.Array:
    """(H, W, C) same-padding depthwise conv with an (11, 11) window."""
    c = img.shape[-1]
    lhs = img.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    rhs = window[None, None]  # (1, 1, 11, 11)
    out = jax.lax.conv_general_dilated(
        lhs,
        jnp.tile(rhs, (1, 1, 1, 1)),
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=1,
    )  # depthwise via batch trick: C acts as batch
    return out[:, 0].transpose(1, 2, 0)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Mean SSIM over an (H, W, C) image pair (loss_utils.py:43-65)."""
    window = _gaussian_window(window_size)
    mu1 = _filter2d(img1, window)
    mu2 = _filter2d(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, window) - mu2_sq
    sigma12 = _filter2d(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def photometric_loss(
    pred: jax.Array, gt: jax.Array, lambda_dssim: float = 0.2
) -> jax.Array:
    """(1-λ)·L1 + λ·(1-SSIM), the 3DGS training loss (train.py:96-100)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (
        1.0 - ssim(pred, gt)
    )


# ---- geometric regularizers --------------------------------------------------


def compute_scale_and_shift(pred, target, mask):
    """Masked least-squares (scale, shift) aligning pred to target
    (loss_utils.py:67-92), closed-form 2x2 solve."""
    w = mask.astype(jnp.float32)
    a00 = jnp.sum(w * pred * pred)
    a01 = jnp.sum(w * pred)
    a11 = jnp.sum(w)
    b0 = jnp.sum(w * pred * target)
    b1 = jnp.sum(w * target)
    det = a00 * a11 - a01 * a01
    ok = det > 0
    safe_det = jnp.where(ok, det, 1.0)
    scale = jnp.where(ok, (a11 * b0 - a01 * b1) / safe_det, 0.0)
    shift = jnp.where(ok, (-a01 * b0 + a00 * b1) / safe_det, 0.0)
    return scale, shift


def depth_loss(
    pred: jax.Array,
    mono_gt: jax.Array,
    scene_scale: float = 5.0,
    gt_divisor: float = 25.0,
) -> jax.Array:
    """Scale-shift-invariant mono-depth regularizer (loss_utils.py:94-116).

    The monocular GT is divided by 25 (reference convention), aligned to
    the prediction with a detached ls fit, weighted by exp(-d/s).
    """
    pred = pred.reshape(-1)
    gt = mono_gt.reshape(-1) / gt_divisor
    mask = gt > 0
    scale, shift = compute_scale_and_shift(
        jax.lax.stop_gradient(pred), gt, mask
    )
    w = mask.astype(jnp.float32) * jnp.exp(
        -jax.lax.stop_gradient(pred) / scene_scale
    )
    return jnp.mean(w * (scale * pred + shift - gt) ** 2)


def normal_loss(
    pred: jax.Array,
    gt: jax.Array,
    depth: jax.Array | None = None,
    scene_scale: float = 5.0,
) -> jax.Array:
    """L1 + 0.1·(-cos) on normalized normals (loss_utils.py:118-132),
    masked to 0 < depth < scene_scale."""
    np_ = pred / jnp.maximum(
        jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-12
    )
    ng = gt / jnp.maximum(jnp.linalg.norm(gt, axis=-1, keepdims=True), 1e-12)
    if depth is not None:
        m = ((depth > 0) & (depth < scene_scale)).astype(jnp.float32)[
            ..., None
        ]
        denom = jnp.maximum(m.sum() * 3, 1.0)
        l1 = jnp.sum(m * jnp.abs(np_ - ng)) / denom
        cos = -jnp.sum(m[..., 0] * jnp.sum(np_ * ng, axis=-1)) / jnp.maximum(
            m.sum(), 1.0
        )
    else:
        l1 = jnp.mean(jnp.abs(np_ - ng))
        cos = -jnp.mean(jnp.sum(np_ * ng, axis=-1))
    return l1 + 0.1 * cos


def opacity_loss(alpha: jax.Array) -> jax.Array:
    """Mean rendered alpha (floater suppressor, loss_utils.py:134-141)."""
    return jnp.mean(alpha)


def sparsity_loss(opacity: jax.Array, mask: jax.Array | None = None):
    """log(o) + log(1-o) binary-entropy push (loss_utils.py:143-150)."""
    eps = 1e-3
    val = jnp.clip(opacity, eps, 1 - eps)
    term = jnp.log(val) + jnp.log(1 - val)
    if mask is not None:
        m = mask.astype(jnp.float32)
        return jnp.sum(term * m) / jnp.maximum(m.sum(), 1.0)
    return jnp.mean(term)


def anisotropic_loss(
    scales: jax.Array, mask: jax.Array | None = None, r: float = 3.0
) -> jax.Array:
    """PhysGaussian max/min-scale ratio clamp (loss_utils.py:152-168)."""
    eps = 1e-6
    ratio = jnp.max(scales, axis=-1) / (jnp.min(scales, axis=-1) + eps)
    term = jnp.maximum(ratio, r) - r
    if mask is not None:
        m = mask.astype(jnp.float32)
        return jnp.sum(term * m) / jnp.maximum(m.sum(), 1.0)
    return jnp.mean(term)


def psnr(pred: jax.Array, gt: jax.Array) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


# ---- depth -> pseudo-normal ---------------------------------------------------


def depth_to_normal(points3d: jax.Array) -> jax.Array:
    """Pseudo-normals from backprojected depth (gaussian_renderer
    depth_pcd2normal, __init__.py:23-38): cross products of central
    differences, zero border."""
    h, w, _ = points3d.shape
    out = jnp.zeros_like(points3d)
    top = points3d[:-2, 1:-1]
    bottom = points3d[2:, 1:-1]
    left = points3d[1:-1, :-2]
    right = points3d[1:-1, 2:]
    normal = jnp.cross(right - left, top - bottom)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )
    return out.at[1:-1, 1:-1].set(normal)
