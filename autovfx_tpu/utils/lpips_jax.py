"""LPIPS (VGG16) perceptual distance in pure JAX.

Parity target: the reference's ``lpipsPyTorch`` wrapper used by
``sugar/metrics.py:7-9,223-245`` and the masked inpaint-retrain loss
(``inpaint/retrain_utils.py:29-56``).

Architecture: VGG16 features at the 5 canonical taps (relu1_2, relu2_2,
relu3_3, relu4_3, relu5_3), unit-normalized per channel, squared
differences reduced by learned 1x1 linear heads, mean over space, summed
over taps — exactly the LPIPS(vgg) formulation.

Weights: this environment ships no pretrained VGG (zero egress), so the
conv/lin weights load from an ``.npz`` at ``AUTOVFX_LPIPS_WEIGHTS``
(convert any torch LPIPS checkpoint offline:
``{"conv0_w": (64,3,3,3), "conv0_b": (64,), ..., "lin0": (64,), ...}``).
Without a weights file, the extractor falls back to DETERMINISTIC
random He-initialized filters (seed 0) with uniform heads — random
deep features are a known usable perceptual metric (Amir & Weiss 2021,
"Understanding and Simplifying Perceptual Distances"); the value is not
comparable to canonical LPIPS numbers and ``source`` marks it.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# VGG16 conv plan: (out_channels, pool_before) per conv layer, with tap
# indices after the listed ReLUs
_VGG_PLAN = [
    (64, False), (64, False),          # relu1_1, relu1_2*
    (128, True), (128, False),         # relu2_1, relu2_2*
    (256, True), (256, False), (256, False),   # relu3_3*
    (512, True), (512, False), (512, False),   # relu4_3*
    (512, True), (512, False), (512, False),   # relu5_3*
]
_TAPS = (1, 3, 6, 9, 12)
# ImageNet normalization (the LPIPS "scaling layer")
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPSParams(NamedTuple):
    convs: tuple  # ((w (kh,kw,cin,cout), b (cout,)), ...)
    lins: tuple  # per-tap (c,) nonnegative head weights
    source: str  # "file" | "random"


def _random_params(seed: int = 0) -> LPIPSParams:
    rng = np.random.RandomState(seed)
    convs = []
    cin = 3
    for cout, _ in _VGG_PLAN:
        std = float(np.sqrt(2.0 / (3 * 3 * cin)))
        w = rng.randn(3, 3, cin, cout).astype(np.float32) * std
        b = np.zeros((cout,), np.float32)
        convs.append((w, b))
        cin = cout
    lins = tuple(
        np.full((_VGG_PLAN[t][0],), 1.0 / _VGG_PLAN[t][0], np.float32)
        for t in _TAPS
    )
    return LPIPSParams(convs=tuple(convs), lins=lins, source="random")


def _file_params(path: str) -> LPIPSParams:
    data = np.load(path)
    convs = []
    for i in range(len(_VGG_PLAN)):
        w = np.asarray(data[f"conv{i}_w"], np.float32)
        if w.shape[0] != 3 or w.shape[1] != 3:  # torch OIHW -> HWIO
            w = w.transpose(2, 3, 1, 0)
        convs.append((w, np.asarray(data[f"conv{i}_b"], np.float32)))
    lins = tuple(
        np.maximum(np.asarray(data[f"lin{k}"], np.float32).reshape(-1), 0)
        for k in range(len(_TAPS))
    )
    return LPIPSParams(convs=tuple(convs), lins=lins, source="file")


@functools.lru_cache(maxsize=2)
def get_params(weights_path: str | None = None) -> LPIPSParams:
    path = weights_path or os.environ.get("AUTOVFX_LPIPS_WEIGHTS")
    if path and os.path.exists(path):
        return _file_params(path)
    return _random_params()


def _features(x: jax.Array, params: LPIPSParams):
    """x: (B, H, W, 3) in [-1, 1] (LPIPS input convention)."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    for i, ((cout, pool), (w, b)) in enumerate(
        zip(_VGG_PLAN, params.convs)
    ):
        if pool:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b)
        x = jax.nn.relu(x)
        if i in _TAPS:
            feats.append(x)
    return feats


def lpips_distance(
    img1: jax.Array,
    img2: jax.Array,
    params: LPIPSParams | None = None,
    mask: jax.Array | None = None,
) -> jax.Array:
    """LPIPS between (H, W, 3) images in [0, 1] (or batched (B, H, W, 3)).

    ``mask`` (H, W): restrict the spatial mean to masked pixels — the
    inpaint-retrain variant (retrain_utils.py:29-56 applies the loss on
    the masked crop).
    """
    if params is None:
        params = get_params()
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
        squeeze = True
    else:
        squeeze = False
    f1 = _features(img1 * 2.0 - 1.0, params)
    f2 = _features(img2 * 2.0 - 1.0, params)
    total = 0.0
    for t, (a, b, lin) in enumerate(zip(f1, f2, params.lins)):
        a = a / jnp.maximum(
            jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10
        )
        b = b / jnp.maximum(
            jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10
        )
        d = jnp.sum((a - b) ** 2 * jnp.asarray(lin), axis=-1)  # (B,h,w)
        if mask is not None:
            m = mask[None].astype(jnp.float32)
            # pool the mask to this tap's resolution
            while m.shape[1] > d.shape[1]:
                m = jax.lax.reduce_window(
                    m, -jnp.inf, jax.lax.max, (1, 2, 2), (1, 2, 2),
                    "VALID",
                )
            m = m[:, : d.shape[1], : d.shape[2]]
            total = total + jnp.sum(d * m, axis=(1, 2)) / jnp.maximum(
                jnp.sum(m, axis=(1, 2)), 1.0
            )
        else:
            total = total + jnp.mean(d, axis=(1, 2))
    return total[0] if squeeze else total


def convert_torch_lpips(
    vgg_state: dict, lpips_state: dict
) -> dict:
    """Map torch VGG16 + `lpips` package linear-head state dicts to the
    ``AUTOVFX_LPIPS_WEIGHTS`` npz layout (numpy in, numpy out — no
    torch import; tensors must already be converted to arrays).

    ``vgg_state``: torchvision vgg16 ``state_dict()`` — conv layers at
    ``features.{0,2,5,7,10,12,14,17,19,21,24,26,28}.weight/bias``
    (OIHW, transposed to HWIO at load by ``_file_params``).
    ``lpips_state``: lpips.LPIPS(net='vgg') state — heads at
    ``lins.{k}.model.1.weight`` (1x1 convs, (1, C, 1, 1)).
    """
    torch_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    assert len(torch_conv_idx) == len(_VGG_PLAN)
    out = {}
    for k, ti in enumerate(torch_conv_idx):
        w = np.asarray(vgg_state[f"features.{ti}.weight"], np.float32)
        b = np.asarray(vgg_state[f"features.{ti}.bias"], np.float32)
        assert w.shape[2:] == (3, 3), (ti, w.shape)
        assert w.shape[0] == _VGG_PLAN[k][0], (ti, w.shape)
        out[f"conv{k}_w"] = w  # OIHW; _file_params transposes
        out[f"conv{k}_b"] = b
    for k in range(len(_TAPS)):
        key = f"lins.{k}.model.1.weight"
        if key not in lpips_state:  # older lpips layout
            key = f"lin{k}.model.1.weight"
        lin = np.asarray(lpips_state[key], np.float32).reshape(-1)
        assert lin.shape[0] == _VGG_PLAN[_TAPS[k]][0], (k, lin.shape)
        out[f"lin{k}"] = lin
    return out
