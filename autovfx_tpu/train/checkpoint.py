"""Training checkpoint / resume.

Parity target: 3DGS ``scene.save(iteration)`` PLY snapshots at 7k/15k/30k
(train.py:157-159) plus full optimizer ``capture()``/``restore()`` .pth
checkpoints (train.py:35-37,186-188; gaussian_model.py:61-93), and
SuGaR's ``save_model`` dict ckpts (sugar_model.py:2230-2236).

Native format: a single .npz per checkpoint holding the full TrainState
(gaussians + Adam moments + densification stats + step) — resumable
bit-exactly; plus the standard PLY export for interop.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from autovfx_tpu.core import ply_io
from autovfx_tpu.core.gaussians import Gaussians
from autovfx_tpu.train.densify import DensifyStats
from autovfx_tpu.train.trainer import AdamState, TrainState


def _gauss_to_dict(g: Gaussians, prefix: str) -> dict:
    return {
        f"{prefix}{k}": np.asarray(getattr(g, k))
        for k in (
            "xyz", "sh_dc", "sh_rest", "log_scales", "quats",
            "opacity_logit", "active",
        )
    }


def _gauss_from_dict(d: dict, prefix: str) -> Gaussians:
    return Gaussians(
        **{
            k: jnp.asarray(d[f"{prefix}{k}"])
            for k in (
                "xyz", "sh_dc", "sh_rest", "log_scales", "quats",
                "opacity_logit", "active",
            )
        }
    )


def save_checkpoint(path: str, state: TrainState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {}
    payload.update(_gauss_to_dict(state.gaussians, "g_"))
    payload.update(_gauss_to_dict(state.adam.m, "m_"))
    payload.update(_gauss_to_dict(state.adam.v, "v_"))
    payload["adam_count"] = np.asarray(state.adam.count)
    payload["stats_grad_accum"] = np.asarray(state.stats.grad_accum)
    payload["stats_denom"] = np.asarray(state.stats.denom)
    payload["stats_max_radii"] = np.asarray(state.stats.max_radii)
    payload["step"] = np.asarray(state.step)
    np.savez_compressed(path, **payload)


def load_checkpoint(path: str) -> TrainState:
    d = dict(np.load(path))
    return TrainState(
        gaussians=_gauss_from_dict(d, "g_"),
        adam=AdamState(
            m=_gauss_from_dict(d, "m_"),
            v=_gauss_from_dict(d, "v_"),
            count=jnp.asarray(d["adam_count"]),
        ),
        stats=DensifyStats(
            grad_accum=jnp.asarray(d["stats_grad_accum"]),
            denom=jnp.asarray(d["stats_denom"]),
            max_radii=jnp.asarray(d["stats_max_radii"]),
        ),
        step=jnp.asarray(d["step"]),
    )


def save_snapshot(
    model_dir: str, state: TrainState, iteration: int,
    with_ply: bool = True,
) -> str:
    """Reference layout: point_cloud/iteration_N/point_cloud.ply +
    chkpntN.npz (train.py:157-159,186-188 naming convention)."""
    ckpt = os.path.join(model_dir, f"chkpnt{iteration}.npz")
    save_checkpoint(ckpt, state)
    if with_ply:
        ply_dir = os.path.join(
            model_dir, "point_cloud", f"iteration_{iteration}"
        )
        os.makedirs(ply_dir, exist_ok=True)
        ply_io.save_ply(
            os.path.join(ply_dir, "point_cloud.ply"), state.gaussians
        )
    return ckpt
