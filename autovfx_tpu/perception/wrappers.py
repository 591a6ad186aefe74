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


def _mask_bbox(mask: np.ndarray):
    ys, xs = np.where(mask)
    if len(ys) == 0:
        return None
    return xs.min(), ys.min(), xs.max(), ys.max()


def _bboxes_overlap(a, b) -> bool:
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    return not (ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0)


def _instances_overlap(
    dir_a: str, dir_b: str, overlap_ratio: float
) -> bool:
    """Bbox overlap on >= ``overlap_ratio`` of the co-visible frames
    (tracking/demo_utils.py:29-78 semantics)."""
    from PIL import Image

    frames_a = {os.path.basename(f) for f in glob.glob(
        os.path.join(dir_a, "*.png"))}
    frames_b = {os.path.basename(f) for f in glob.glob(
        os.path.join(dir_b, "*.png"))}
    both = sorted(frames_a & frames_b)
    if not both:
        return False
    hits = 0
    for name in both:
        ma = np.asarray(
            Image.open(os.path.join(dir_a, name)).convert("L")) > 127
        mb = np.asarray(
            Image.open(os.path.join(dir_b, name)).convert("L")) > 127
        ba, bb = _mask_bbox(ma), _mask_bbox(mb)
        if ba is None or bb is None:
            continue
        if _bboxes_overlap(ba, bb):
            hits += 1
    return hits / len(both) >= overlap_ratio


def merge_instances(tracking_dir: str, overlap_ratio: float = 0.7) -> List[int]:
    """Greedy instance merge by co-visible bbox overlap
    (tracking/demo_utils.py:121-162).

    Two instances whose mask bounding boxes overlap in >= 70 % of their
    co-visible frames are the same object split by the detector; their
    masks are unioned into a new instance folder named ``id_a + id_b``
    and the parents removed.  Returns the surviving ids.
    """
    import shutil

    from PIL import Image

    ids = sorted(int(x) for x in os.listdir(tracking_dir) if x.isdigit())
    changed = True
    while changed:
        changed = False
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                dir_a = os.path.join(tracking_dir, str(a))
                dir_b = os.path.join(tracking_dir, str(b))
                if not _instances_overlap(dir_a, dir_b, overlap_ratio):
                    continue
                new_id = a + b
                dir_new = os.path.join(tracking_dir, str(new_id))
                os.makedirs(dir_new, exist_ok=True)
                names = {
                    os.path.basename(f)
                    for d in (dir_a, dir_b)
                    for f in glob.glob(os.path.join(d, "*.png"))
                }
                for name in sorted(names):
                    acc = None
                    for d in (dir_a, dir_b):
                        p = os.path.join(d, name)
                        if not os.path.exists(p):
                            continue
                        m = np.asarray(
                            Image.open(p).convert("L")) > 127
                        acc = m if acc is None else (acc | m)
                    Image.fromarray(
                        (acc.astype(np.uint8)) * 255
                    ).save(os.path.join(dir_new, name))
                shutil.rmtree(dir_a)
                shutil.rmtree(dir_b)
                ids = [x for x in ids if x not in (a, b)] + [new_id]
                changed = True
                break
            if changed:
                break
    return sorted(ids)


def inpaint_img_with_lama(
    img: np.ndarray, mask: np.ndarray, *, cache_path: Optional[str] = None,
    ckpt_path: Optional[str] = None,
) -> np.ndarray:
    """LaMa inpainting (inpaint/lama_inpaint.py:26-82).

    Resolution order: a precomputed result at ``cache_path``; the native
    JAX big-lama net (``lama_jax``) when a checkpoint is installed
    (``ckpt_path`` arg, $AUTOVFX_LAMA_CKPT, or ~/.cache/autovfx/big-lama);
    last resort a fast OpenCV inpaint (cv2.INPAINT_TELEA) — deterministic
    and dependency-free, with the same contract.
    """
    if cache_path and os.path.exists(cache_path):
        from PIL import Image

        return np.asarray(Image.open(cache_path).convert("RGB"))
    from autovfx_tpu.perception import lama_jax

    out = lama_jax.try_inpaint(img, mask, ckpt_path=ckpt_path)
    if out is not None:
        return out
    import cv2

    img8 = (
        img if img.dtype == np.uint8 else np.clip(img * 255, 0, 255).astype(
            np.uint8
        )
    )
    m8 = (np.asarray(mask) > 0).astype(np.uint8) * 255
    return cv2.inpaint(img8, m8, 7, cv2.INPAINT_TELEA)


def inpaint_img(
    img_path: str,
    text_prompt: str = "",
    dilate_kernel_size: int = 10,
    erode_kernel_size: int = 0,
    alpha_threshold: float = 0.7,
) -> str:
    """Alpha-mask panorama inpaint (inpaint/inpaint_anything.py:50-96):
    pixels whose ALPHA channel falls below ``alpha_threshold`` form the
    hole, the mask is eroded/dilated to kill edge fringing, and the RGB
    is inpainted (LaMa-native / cv2 fallback via inpaint_img_with_lama).
    Writes ``<img>_mask.png`` + ``<img>_inpaint.png`` and returns the
    inpainted path — the reference's exact file contract."""
    from PIL import Image

    rgba = np.asarray(Image.open(img_path).convert("RGBA"))
    mask = rgba[..., 3] < alpha_threshold * 255
    from scipy import ndimage

    if erode_kernel_size:
        mask = ndimage.binary_erosion(
            mask, np.ones((erode_kernel_size,) * 2, bool)
        )
    if dilate_kernel_size:
        mask = ndimage.binary_dilation(
            mask, np.ones((dilate_kernel_size,) * 2, bool)
        )
    mask8 = mask.astype(np.uint8) * 255
    base = img_path[:-4]
    Image.fromarray(mask8).save(base + "_mask.png")
    out = inpaint_img_with_lama(rgba[..., :3], mask8)
    out_path = base + "_inpaint.png"
    Image.fromarray(np.asarray(out, np.uint8)).save(out_path)
    return out_path


def fill_img_with_sd(
    img: np.ndarray,
    mask: np.ndarray,
    text_prompt: str,
    cache_path: Optional[str] = None,
) -> np.ndarray:
    """Stable-Diffusion inpaint alternative
    (inpaint/stable_diffusion_inpaint.py:13-35).  The diffusion model is
    an external network (BASELINE precomputed-input contract): a
    precomputed result at ``cache_path`` is consumed first; otherwise
    the diffusers pipeline runs when installed AND downloads are opted
    in; else the LaMa-native path answers with the same contract."""
    if cache_path and os.path.exists(cache_path):
        from PIL import Image

        return np.asarray(Image.open(cache_path).convert("RGB"))
    if os.environ.get("AUTOVFX_ALLOW_HUB_DOWNLOAD") == "1":
        try:
            import torch
            from diffusers import AutoPipelineForInpainting
            from PIL import Image

            pipe = AutoPipelineForInpainting.from_pretrained(
                "diffusers/stable-diffusion-xl-1.0-inpainting-0.1",
                torch_dtype=torch.float32,
            )
            out = pipe(
                prompt=text_prompt or "Fill the missing part.",
                image=Image.fromarray(np.asarray(img, np.uint8)),
                mask_image=Image.fromarray(
                    (np.asarray(mask) > 0).astype(np.uint8) * 255
                ),
            ).images[0]
            return np.asarray(out)
        except Exception as e:  # noqa: BLE001 — fall through to LaMa
            print(f"# SD inpaint unavailable ({e}); using LaMa path")
    return inpaint_img_with_lama(np.asarray(img), np.asarray(mask))


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
