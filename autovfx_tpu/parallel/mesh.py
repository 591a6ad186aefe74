"""Device-mesh construction for multi-chip execution over ICI.

The reference is strictly single-GPU (SURVEY §2.2); the TPU framework's
scaling axes are:
- ``data``  — training cameras / pixels (gradient psum over ICI),
- ``gauss`` — the splat buffer, depth-slab sharded for scenes larger
  than one chip's HBM (sequential over-composite across slabs).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "gauss"),
    devices=None,
) -> Mesh:
    """Build a mesh over all (or given) devices.

    Default: all devices on the ``data`` axis, 1 on ``gauss``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))
