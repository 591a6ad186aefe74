"""3DGS retraining on inpainted views after object removal.

Parity target: ``scene_representation.training_3DGS_for_inpainting``
(reference :450-543) with the loss of ``inpaint/retrain_utils.py:29-56``:
masked L1 over the removal region + LPIPS on the masked region when the
mask is large (is_large_mask: bbox >= 32px), unmasked photometric
elsewhere; densify every 300 iters with min_opacity 0.1, then save
``inpaint_gaussians.ply``.

TPU-first: the reference crops the mask bbox and tiles it into 2x2
patches for LPIPS (dynamic shapes); here the LPIPS spatial mean is
masked instead (utils/lpips_jax.lpips_distance(mask=...)) — same
restriction of the perceptual term to the inpainted region, with static
shapes under jit.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core import cameras as C
from autovfx_tpu.core import ply_io
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.train import losses as L
from autovfx_tpu.train import trainer as T
from autovfx_tpu.utils.lpips_jax import get_params, lpips_distance


def is_large_mask(mask: np.ndarray, min_extent: int = 32) -> bool:
    """retrain_utils.py:47-56: LPIPS only when the bbox is >= 32px."""
    ys, xs = np.where(mask)
    if len(ys) == 0:
        return False
    return (
        xs.max() - xs.min() >= min_extent
        and ys.max() - ys.min() >= min_extent
    )


def inpaint_loss(
    g,
    offset,
    cam,
    gt_rgb: jax.Array,
    mask: jax.Array,
    cfg: T.TrainConfig,
    use_lpips: bool,
    lambda_lpips: float = 0.4,
):
    """Masked L1 (+ masked LPIPS when the mask is large) + DSSIM."""
    bg = jnp.zeros((3,), jnp.float32)
    out = rasterize(
        g, cam, bg=bg, config=cfg.raster, mean2d_offset=offset
    )
    m = mask.astype(jnp.float32)[..., None]
    l1 = jnp.sum(jnp.abs(out.color - gt_rgb) * m) / jnp.maximum(
        jnp.sum(m) * 3.0, 1.0
    )
    # keep the un-inpainted region anchored (reference trains on the
    # full inpainted render; masked emphasis mirrors its mask gating)
    full = L.photometric_loss(out.color, gt_rgb, cfg.lambda_dssim)
    loss = full + l1
    if use_lpips:
        loss = loss + lambda_lpips * lpips_distance(
            out.color, gt_rgb, params=get_params(), mask=mask
        )
    psnr = L.psnr(out.color, gt_rgb)
    return loss, (out.radii, out.overflow, psnr)


def training_3DGS_for_inpainting(
    scene_representation,
    removal_gaussians_path: str,
    inpainted_dir: str,
    mask_dir: str,
    out_dir: str,
    camera_poses_json: str,
    iterations: int = 2000,
):
    from PIL import Image

    g = ply_io.load_gaussians(removal_gaussians_path)
    cap = int(1.5 * g.capacity)
    g = g.pad_to(max(cap, g.capacity + 1024))

    cams, _, names = C.load_custom_trajectory(camera_poses_json)
    imgs, masks, large = [], [], []
    for name in names:
        img = np.asarray(
            Image.open(os.path.join(inpainted_dir, name)).convert("RGB"),
            np.float32,
        ) / 255.0
        imgs.append(img)
        mp = os.path.join(mask_dir, name)
        if os.path.exists(mp):
            m = np.asarray(Image.open(mp).convert("L")) > 127
        else:
            m = np.ones(img.shape[:2], bool)
        masks.append(m)
        large.append(is_large_mask(m))
    imgs = jnp.asarray(np.stack(imgs))
    masks_j = jnp.asarray(np.stack(masks))

    backend = "pallas" if jax.default_backend() == "tpu" else "ref"
    cfg = T.TrainConfig(
        iterations=iterations,
        raster=RasterConfig(
            dup_budget=scene_representation.hparams.dup_budget,
            backend=backend,
        ),
        densification_interval=300,
        min_opacity=0.1,
        densify_from_iter=300,
        densify_until_iter=iterations,
        opacity_reset_interval=10**9,
        spatial_lr_scale=scene_representation.scene_scale,
    )

    state = T.init_state(g)

    def step(state, cam, img, mask, use_lpips: bool):
        g_cur = state.gaussians
        params = {f: getattr(g_cur, f) for f in T.PARAM_FIELDS}
        offset0 = jnp.zeros((g_cur.capacity, 2), jnp.float32)

        def loss_fn(params, offset):
            gg = g_cur.replace(**params)
            return inpaint_loss(
                gg, offset, cam, img, mask, cfg, use_lpips
            )

        (loss, (radii, overflow, psnr)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset0)
        param_grads, mean2d_grad = grads
        g_new, adam = T.apply_adam(
            g_cur, state.adam, param_grads, state.step, cfg
        )
        return T.TrainState(
            gaussians=g_new,
            adam=adam,
            stats=state.stats.update(
                mean2d_grad, radii, cam.width, cam.height
            ),
            step=state.step + 1,
        ), psnr

    step_lpips = jax.jit(lambda s, c, i, m: step(s, c, i, m, True))
    step_plain = jax.jit(lambda s, c, i, m: step(s, c, i, m, False))
    densify_fn = jax.jit(
        lambda s, k, it: T.densify_step(s, k, cfg, it), static_argnums=(2,)
    )

    key = jax.random.PRNGKey(0)
    n = imgs.shape[0]
    for it in range(1, iterations + 1):
        key, k1, k2 = jax.random.split(key, 3)
        ci = int(jax.random.randint(k1, (), 0, n))
        cam = C.index_camera(cams, ci)
        fn = step_lpips if large[ci] else step_plain
        state, _ = fn(state, cam, imgs[ci], masks_j[ci])
        if (
            it >= cfg.densify_from_iter
            and it < cfg.densify_until_iter
            and it % cfg.densification_interval == 0
        ):
            state, _ = densify_fn(state, k2, it)

    out_path = os.path.join(out_dir, "inpaint_gaussians.ply")
    os.makedirs(out_dir, exist_ok=True)
    ply_io.save_ply(out_path, state.gaussians)
    return out_path
