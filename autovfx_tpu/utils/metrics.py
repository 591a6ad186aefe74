"""Evaluation harness: PSNR / SSIM / LPIPS over the eval split.

Parity target: ``sugar/metrics.py:24-416`` — every-8th-frame eval split
(:21), PSNR/SSIM/LPIPS(vgg) per model variant, results to JSON.

LPIPS requires pretrained VGG weights (lpipsPyTorch in the reference);
this environment has no torchvision/lpips packages and no network, so
LPIPS activates only when a weights file is supplied via
``AUTOVFX_LPIPS_WEIGHTS`` (a torch state dict); otherwise it is reported
as null.  PSNR/SSIM are native JAX.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core.cameras import Camera, index_camera, num_cameras
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.train.losses import psnr as _psnr, ssim as _ssim

EVAL_EVERY_NTH = 8  # metrics.py:21


def eval_split(n_frames: int, every_nth: int = EVAL_EVERY_NTH) -> List[int]:
    return list(range(0, n_frames, every_nth))


def lpips_available() -> bool:
    return True  # native JAX LPIPS (utils/lpips_jax.py), always on


def lpips(img1: np.ndarray, img2: np.ndarray) -> Optional[float]:
    """LPIPS(vgg) via the native JAX implementation
    (utils/lpips_jax.py).  Canonical VGG weights load from
    ``AUTOVFX_LPIPS_WEIGHTS`` (.npz); without them a deterministic
    random-feature metric is used (marked by params.source)."""
    from autovfx_tpu.utils.lpips_jax import lpips_distance

    return float(
        lpips_distance(jnp.asarray(img1), jnp.asarray(img2))
    )


def evaluate(
    g: Gaussians,
    cams: Camera,
    gt_images: np.ndarray,
    config: RasterConfig = RasterConfig(),
    every_nth: int = EVAL_EVERY_NTH,
    out_json: Optional[str] = None,
) -> Dict:
    """PSNR/SSIM(/LPIPS) over the eval split; optionally write JSON."""
    idxs = eval_split(len(gt_images), every_nth)
    render = jax.jit(lambda g, cam: rasterize(g, cam, config=config).color)
    psnrs, ssims, lp = [], [], []
    for i in idxs:
        cam = index_camera(cams, i)
        img = render(g, cam)
        gt = jnp.asarray(gt_images[i])
        psnrs.append(float(_psnr(img, gt)))
        ssims.append(float(_ssim(img, gt)))
        val = lpips(np.asarray(img), np.asarray(gt)) if lpips_available() else None
        if val is not None:
            lp.append(val)
    # LPIPS comparability guard: random-feature LPIPS (no VGG weights
    # file) is a usable *relative* metric but NOT comparable to the
    # reference's LPIPS(vgg) numbers (sugar/metrics.py:7-9).  It is
    # published under a different key so downstream tables can never
    # silently mix the two scales.
    from autovfx_tpu.utils.lpips_jax import get_params

    lp_source = get_params().source
    lp_mean = float(np.mean(lp)) if lp else None
    result = {
        "num_eval_frames": len(idxs),
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "lpips": lp_mean if lp_source == "file" else None,
        "lpips_random_features": (
            lp_mean if lp_source == "random" else None
        ),
        "lpips_source": lp_source,
        "per_frame_psnr": psnrs,
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result
