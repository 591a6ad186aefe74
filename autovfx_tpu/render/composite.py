"""Frame compositor — parity port of ``blender/blend_all.py:92-348``.

Blends, per frame:
  1. the shadow ratio into the background (the reference's
     ``color_diff = rgb_all / rgb_shadow`` quotient on the shadow-catcher
     region, :279-292 — here the ratio comes directly from
     render/shadow.py, and the catcher alpha weighting is preserved),
  2. inserted-object color over the background with the naive
     depth-vs-catcher ``depth_check`` (:78-89), 3DGS-object occlusion
     masks (:255-277), and smoke alpha-max / additive fire passes
     (:294-302).

All inputs are float [0,1] images; everything is jnp and jit-friendly.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def depth_check(depth1, depth2, d_tol: float = 0.1, option: str = "naive"):
    """'Is depth1 in front of depth2' (blend_all.py:78-89)."""
    if option == "naive":
        return depth1 <= depth2
    if option == "tolerance":
        return jnp.abs(depth1 - depth2) < d_tol
    if option == "naive_or_tolerance":
        return (depth1 <= depth2) | (jnp.abs(depth1 - depth2) < d_tol)
    raise ValueError(option)


class CompositeInputs(NamedTuple):
    bg_color: jax.Array  # (H, W, 3) 3DGS background render
    scene_depth: jax.Array  # (H, W) shadow-catcher (scene mesh) depth
    obj_color: jax.Array  # (H, W, 3) inserted-object pass
    obj_alpha: jax.Array  # (H, W)
    obj_depth: jax.Array  # (H, W)
    shadow_ratio: jax.Array  # (H, W) 1=lit (render/shadow.py)
    catcher_alpha: jax.Array  # (H, W) shadow-catcher coverage (rgb_all α)
    # optional extra passes
    obj3dgs_alpha: Optional[jax.Array] = None  # 3DGS-object occlusion pass
    obj3dgs_depth: Optional[jax.Array] = None
    smoke_color: Optional[jax.Array] = None
    smoke_alpha: Optional[jax.Array] = None
    smoke_depth: Optional[jax.Array] = None
    fire_premult: Optional[jax.Array] = None  # additive premultiplied fire


def composite_frame(inp: CompositeInputs) -> jax.Array:
    """One edited frame (blend_all.py:249-307 semantics)."""
    frame = inp.bg_color

    obj_alpha = inp.obj_alpha
    front = depth_check(inp.obj_depth, inp.scene_depth)

    smoke_front = None
    if inp.smoke_alpha is not None:
        smoke_depth = inp.smoke_depth
        smoke_front = depth_check(smoke_depth, inp.scene_depth)
        obj_alpha = jnp.maximum(obj_alpha, inp.smoke_alpha)
        front = front | smoke_front

    obj_mask = obj_alpha > 0.0
    obj_alpha = jnp.where(obj_mask & front, obj_alpha, 0.0)
    non_object_alpha = 1.0 - obj_alpha

    # 3DGS-object pixels keep the background (the splat renderer already
    # drew them); they also occlude inserted objects where in front
    if inp.obj3dgs_alpha is not None:
        non_3dgs = 1.0 - inp.obj3dgs_alpha
        behind_catcher = depth_check(inp.scene_depth, inp.obj3dgs_depth)
        non_3dgs = jnp.where(behind_catcher, 1.0, non_3dgs)
        gs_front = depth_check(inp.obj3dgs_depth, inp.obj_depth)
        obj_alpha = jnp.where(gs_front, obj_alpha * non_3dgs, obj_alpha)
    else:
        non_3dgs = None

    # ---- step 1: shadow (color_diff × catcher-alpha-weighted darkening) ----
    catcher_alpha = non_object_alpha * inp.catcher_alpha
    if non_3dgs is not None:
        catcher_alpha = catcher_alpha * non_3dgs
    ratio = jnp.clip(inp.shadow_ratio, 0.0, 1.0)[..., None]
    shadowed = frame * ratio * catcher_alpha[..., None] + frame * (
        1.0 - catcher_alpha[..., None]
    )
    is_shadow = jnp.abs(ratio - 1.0) >= 0.01
    frame = jnp.where(is_shadow, shadowed, frame)

    # ---- step 2: objects over background ------------------------------------
    frame_tmp = frame
    blend_mask = (obj_mask & front)[..., None]
    over = inp.obj_color * obj_alpha[..., None] + frame_tmp * (
        1.0 - obj_alpha[..., None]
    )
    frame = jnp.where(blend_mask, over, frame)

    if inp.fire_premult is not None and smoke_front is not None:
        fire = inp.fire_premult + frame_tmp * (
            1.0 - inp.smoke_alpha[..., None]
        )
        frame = jnp.where(smoke_front[..., None], fire, frame)

    return jnp.clip(frame, 0.0, 1.0)


def downsample2x(img: jax.Array) -> jax.Array:
    """Bilinear 2x downsample (the reference renders at 2x supersampling,
    all_rendering.py:2195-2209, and averages down, blend_all.py:21-28)."""
    h2 = (img.shape[0] // 2) * 2
    w2 = (img.shape[1] // 2) * 2
    x = img[:h2, :w2]
    if x.ndim == 2:
        return 0.25 * (
            x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2]
        )
    return 0.25 * (
        x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2]
    )


def downsample2x_nearest(img: jax.Array) -> jax.Array:
    """Nearest 2x downsample for depth maps (blend_all.py:216-234)."""
    return img[0::2, 0::2]
