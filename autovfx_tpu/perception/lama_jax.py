"""Native JAX/TPU implementation of the LaMa ("big-lama") inpainting net.

The reference vendors LaMa and runs it in torch
(``inpaint/lama_inpaint.py:26-82``). This module re-implements the
inference path TPU-natively:

- **Architecture** (re-derived, not translated, from the vendored
  saicinpainting sources): an FFC-ResNet generator
  (``saicinpainting/training/modules/ffc.py:233-370``) — reflect-padded
  7x7 stem, three stride-2 downsamples, 18 Fast-Fourier-Convolution
  residual blocks splitting channels into a local (spatial conv) and a
  global (spectral transform: 1x1 conv -> rfft2 -> 1x1 conv on stacked
  re/im -> irfft2) branch at ratio 0.75, three transposed-conv
  upsamples, sigmoid head. big-lama config:
  ``configs/training/big-lama.yaml:26-45`` (ngf 64, 3 downsamples,
  18 blocks, lfu disabled, init/downsample ratios 0).
- **Inference contract** (``training/trainers/default.py:47-71`` +
  ``lama_inpaint.py:64-82``): input = concat([img * (1 - mask), mask]),
  reflect-pad H/W to a multiple of 8, output composite =
  mask * pred + (1 - mask) * img.
- **Weights** are converted once from the released torch-lightning
  checkpoint (``big-lama/models/best.ckpt``): the converter below walks
  the ``generator.model.{i}`` Sequential keys *structurally* (no
  saicinpainting import needed), transposes OIHW -> HWIO, and folds
  BatchNorm running stats into (scale, shift) pairs.

Everything runs in NHWC under one jitted call — convolutions hit the
MXU and the per-block rfft2/irfft2 are XLA-native, so the whole
generator is a single fused TPU program with static shapes per
(padded) resolution.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-5  # torch BatchNorm2d default


# ---------------------------------------------------------------------------
# Checkpoint conversion (torch state dict -> JAX pytree)
# ---------------------------------------------------------------------------


def _oihw_to_hwio(w: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32)


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BatchNorm2d inference = x * scale + shift (running stats folded)."""
    w = np.asarray(sd[prefix + ".weight"], np.float32)
    b = np.asarray(sd[prefix + ".bias"], np.float32)
    m = np.asarray(sd[prefix + ".running_mean"], np.float32)
    v = np.asarray(sd[prefix + ".running_var"], np.float32)
    scale = w / np.sqrt(v + _BN_EPS)
    return jnp.asarray(scale), jnp.asarray(b - m * scale)


def _ffc_params(sd: Dict[str, np.ndarray], p: str) -> Dict[str, Any]:
    """One FFC_BN_ACT: the four branch convs that exist + folded BNs.

    Branch convs are bias-free (FFC defaults); a missing key means that
    branch is nn.Identity in the reference (ratio 0 on one side).
    """
    out: Dict[str, Any] = {"l2l": None, "l2g": None, "g2l": None, "g2g": None,
                           "bn_l": None, "bn_g": None}
    for k in ("l2l", "l2g", "g2l"):
        key = f"{p}.ffc.conv{k}.weight"
        if key in sd:
            out[k] = _oihw_to_hwio(np.asarray(sd[key]))
    g2g = f"{p}.ffc.convg2g"
    if g2g + ".conv1.0.weight" in sd:
        out["g2g"] = {
            "conv1": _oihw_to_hwio(np.asarray(sd[g2g + ".conv1.0.weight"])),
            "bn1": _fold_bn(sd, g2g + ".conv1.1"),
            "fu": _oihw_to_hwio(np.asarray(sd[g2g + ".fu.conv_layer.weight"])),
            "fu_bn": _fold_bn(sd, g2g + ".fu.bn"),
            "conv2": _oihw_to_hwio(np.asarray(sd[g2g + ".conv2.weight"])),
        }
    if p + ".bn_l.weight" in sd:
        out["bn_l"] = _fold_bn(sd, p + ".bn_l")
    if p + ".bn_g.weight" in sd:
        out["bn_g"] = _fold_bn(sd, p + ".bn_g")
    return out


@dataclass
class LamaParams:
    """Converted generator weights (a pytree — jit-traceable as-is)."""

    init: Dict[str, Any]
    down: List[Dict[str, Any]]
    blocks: List[Dict[str, Any]]  # each {"conv1": ffc, "conv2": ffc}
    up: List[Dict[str, Any]]  # each {"w": HWIO(flipped), "b", "bn"}
    out_w: jnp.ndarray
    out_b: jnp.ndarray


jax.tree_util.register_pytree_node(
    LamaParams,
    lambda p: ((p.init, p.down, p.blocks, p.up, p.out_w, p.out_b), None),
    lambda _, c: LamaParams(*c),
)


def convert_torch_state_dict(sd: Dict[str, Any]) -> LamaParams:
    """Structurally parse ``generator.model.{i}.*`` keys of a LaMa ckpt.

    Works for any FFCResNetGenerator size (key-driven, no config file):
    Sequential index 1 is the stem, contiguous ``.ffc.`` entries after it
    are downsamples, ``.conv1.ffc.`` entries are residual blocks, the
    (weight, bias) ConvTranspose pairs + BN after the blocks are
    upsamples, and the final 4-D weight is the output conv.
    """
    gsd = {}
    for k, v in sd.items():
        if k.startswith("generator."):
            k = k[len("generator."):]
        if k.startswith("model."):
            gsd[k[len("model."):]] = (
                v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            )
    idx_of = lambda k: int(k.split(".", 1)[0])  # noqa: E731
    indices = sorted({idx_of(k) for k in gsd})
    down, blocks, ups = [], [], []
    init = None
    convt: Dict[int, Dict[str, Any]] = {}
    out_idx = max(i for i in indices if f"{i}.weight" in gsd
                  and np.asarray(gsd[f"{i}.weight"]).ndim == 4)
    for i in indices:
        if f"{i}.ffc.convl2l.weight" in gsd:
            p = _ffc_params(gsd, str(i))
            if init is None:
                init = p
            else:
                down.append(p)
        elif f"{i}.conv1.ffc.convl2l.weight" in gsd:
            blocks.append({
                "conv1": _ffc_params(gsd, f"{i}.conv1"),
                "conv2": _ffc_params(gsd, f"{i}.conv2"),
            })
        elif f"{i}.weight" in gsd and np.asarray(gsd[f"{i}.weight"]).ndim == 4 \
                and i != out_idx:
            # ConvTranspose2d(k3 s2 p1 op1), torch weight (I, O, kh, kw).
            # Equivalent dilated conv: flip spatially, lay out HWIO.
            w = np.asarray(gsd[f"{i}.weight"], np.float32)
            w = np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))
            convt[i] = {"w": jnp.asarray(w),
                        "b": jnp.asarray(np.asarray(gsd[f"{i}.bias"], np.float32))}
        elif f"{i}.weight" in gsd and np.asarray(gsd[f"{i}.weight"]).ndim == 1:
            convt[max(j for j in convt if j < i)]["bn"] = _fold_bn(gsd, str(i))
    ups = [convt[i] for i in sorted(convt)]
    if init is None or not blocks or not ups:
        raise ValueError(
            "state dict does not look like an FFCResNetGenerator "
            f"(init={init is not None}, blocks={len(blocks)}, ups={len(ups)})"
        )
    return LamaParams(
        init=init, down=down, blocks=blocks, up=ups,
        out_w=_oihw_to_hwio(np.asarray(gsd[f"{out_idx}.weight"], np.float32)),
        out_b=jnp.asarray(np.asarray(gsd[f"{out_idx}.bias"], np.float32)),
    )


def load_lama_params(ckpt_path: str) -> LamaParams:
    """Load + convert a torch big-lama checkpoint.

    ``ckpt_path`` may be the released directory (``big-lama/`` containing
    ``models/best.ckpt``) or a ``.ckpt``/``.pt`` file. torch is only
    needed here, never at inference time.
    """
    if os.path.isdir(ckpt_path):
        for cand in ("models/best.ckpt", "best.ckpt", "models/last.ckpt"):
            p = os.path.join(ckpt_path, cand)
            if os.path.exists(p):
                ckpt_path = p
                break
    import torch

    try:
        # weights-only consumer: avoid the arbitrary-unpickle surface
        raw = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    except Exception:  # noqa: BLE001 — lightning ckpts may need full unpickle
        raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    return convert_torch_state_dict(sd)


# ---------------------------------------------------------------------------
# Forward (NHWC, inference only)
# ---------------------------------------------------------------------------


def _reflect(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, pad: int = 0) -> jnp.ndarray:
    if pad:
        x = _reflect(x, pad)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn_act(x: jnp.ndarray, bn: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
    return jax.nn.relu(x * bn[0] + bn[1])


def _fourier_unit(x: jnp.ndarray, w: jnp.ndarray,
                  bn: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
    """rfft2 -> 1x1 conv over interleaved (re, im) channels -> irfft2.

    Channel interleave [c0_re, c0_im, c1_re, ...] matches the torch
    view() layout the released weights were trained with
    (``ffc.py:86-92``: stack on a trailing axis then flatten).
    """
    b, h, wd, c = x.shape
    f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
    f = jnp.stack([f.real, f.imag], axis=-1).reshape(b, h, wd // 2 + 1, 2 * c)
    f = _bn_act(_conv(f, w), bn)
    f = f.reshape(b, h, wd // 2 + 1, w.shape[-1] // 2, 2)
    f = jax.lax.complex(f[..., 0], f[..., 1])
    return jnp.fft.irfft2(f, s=(h, wd), axes=(1, 2), norm="ortho")


def _spectral(x: jnp.ndarray, p: Dict[str, Any]) -> jnp.ndarray:
    x = _bn_act(_conv(x, p["conv1"]), p["bn1"])
    return _conv(x + _fourier_unit(x, p["fu"], p["fu_bn"]), p["conv2"])


def _ffc_bn_act(xl: jnp.ndarray, xg: Optional[jnp.ndarray],
                p: Dict[str, Any], stride: int = 1, pad: int = 0
                ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    out_l = out_g = None
    if p["l2l"] is not None:
        out_l = _conv(xl, p["l2l"], stride, pad)
    if p["g2l"] is not None and xg is not None:
        g = _conv(xg, p["g2l"], stride, pad)
        out_l = g if out_l is None else out_l + g
    if p["l2g"] is not None:
        out_g = _conv(xl, p["l2g"], stride, pad)
    if p["g2g"] is not None and xg is not None:
        g = _spectral(xg, p["g2g"])
        out_g = g if out_g is None else out_g + g
    if out_l is not None and p["bn_l"] is not None:
        out_l = _bn_act(out_l, p["bn_l"])
    if out_g is not None and p["bn_g"] is not None:
        out_g = _bn_act(out_g, p["bn_g"])
    return out_l, out_g


def _conv_transpose2x(x: jnp.ndarray, p: Dict[str, Any]) -> jnp.ndarray:
    """torch ConvTranspose2d(k3, s2, p1, output_padding=1) == conv of the
    2x-zero-stuffed input with the pre-flipped kernel, pad (1, 2)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _bn_act(y + p["b"], p["bn"])


def lama_generator(params: LamaParams, x: jnp.ndarray) -> jnp.ndarray:
    """FFCResNetGenerator forward. x: (B, H, W, 4) f32, H/W mod-8 == 0."""
    xl, _ = _ffc_bn_act(_reflect(x, 3), None, params.init)
    xg: Optional[jnp.ndarray] = None
    for d in params.down:
        xl, xg = _ffc_bn_act(xl, xg, d, stride=2, pad=1)
    for blk in params.blocks:
        yl, yg = _ffc_bn_act(xl, xg, blk["conv1"], pad=1)
        yl, yg = _ffc_bn_act(yl, yg, blk["conv2"], pad=1)
        xl = xl + yl
        xg = yg if xg is None else xg + yg
    y = xl if xg is None else jnp.concatenate([xl, xg], axis=-1)
    for u in params.up:
        y = _conv_transpose2x(y, u)
    y = _conv(_reflect(y, 3), params.out_w) + params.out_b
    return jax.nn.sigmoid(y)


@partial(jax.jit, static_argnums=())
def _inpaint_jit(params: LamaParams, img: jnp.ndarray, mask: jnp.ndarray
                 ) -> jnp.ndarray:
    """img (1,H,W,3) in [0,1]; mask (1,H,W,1) in {0,1}; H/W mod 8 == 0."""
    masked = jnp.concatenate([img * (1.0 - mask), mask], axis=-1)
    pred = lama_generator(params, masked)
    return mask * pred + (1.0 - mask) * img


def inpaint_with_params(params: LamaParams, img: np.ndarray,
                        mask: np.ndarray, mod: int = 8) -> np.ndarray:
    """Full inference contract of ``inpaint_img_with_lama``.

    img: (H, W, 3) uint8 or float [0,1]; mask: (H, W), nonzero = hole.
    Returns (H, W, 3) uint8.
    """
    h, w = img.shape[:2]
    imgf = img.astype(np.float32) / (255.0 if img.dtype == np.uint8 else 1.0)
    m = (np.asarray(mask) > 0).astype(np.float32)
    ph, pw = (-h) % mod, (-w) % mod
    # reflect pad to modulo (evaluation/data.py:36-40)
    imgf = np.pad(imgf, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    m = np.pad(m, ((0, ph), (0, pw)), mode="reflect")
    out = _inpaint_jit(params, jnp.asarray(imgf)[None],
                       jnp.asarray(m)[None, :, :, None])
    out = np.asarray(out[0, :h, :w])
    return np.clip(out * 255.0, 0, 255).astype(np.uint8)


# Module-level cache so repeated wrapper calls convert the ckpt once.
_LOADED: Dict[str, LamaParams] = {}


def default_ckpt_path() -> Optional[str]:
    """Resolve the big-lama checkpoint: $AUTOVFX_LAMA_CKPT, then the
    conventional cache location."""
    for cand in (os.environ.get("AUTOVFX_LAMA_CKPT"),
                 os.path.expanduser("~/.cache/autovfx/big-lama")):
        if cand and os.path.exists(cand):
            return cand
    return None


def try_inpaint(img: np.ndarray, mask: np.ndarray,
                ckpt_path: Optional[str] = None) -> Optional[np.ndarray]:
    """Run LaMa if a checkpoint is resolvable; None otherwise (caller
    falls back). Any torch-load failure raises — a present-but-broken
    checkpoint should be loud, not silently degrade to TELEA."""
    path = ckpt_path or default_ckpt_path()
    if path is None:
        return None
    if path not in _LOADED:
        _LOADED[path] = load_lama_params(path)
    return inpaint_with_params(_LOADED[path], img, mask)
