"""Checkpoint IO: vanilla-3DGS ``.ply`` and SuGaR ``.pt`` readers/writers.

Bit-compatible with the reference formats:
- PLY layout from ``scene/gaussian_model.py:201-266`` (save_ply/load_ply):
  properties x,y,z,nx,ny,nz,f_dc_{0..2},f_rest_{0..3*(K-1)-1},opacity,
  scale_{0..2},rot_{0..3}; f_rest is channel-major ((N,3,K-1) flattened).
- SuGaR checkpoint tensors from ``scene_representation.py:196-215``:
  state_dict keys _points, all_densities, _sh_coordinates_dc,
  _sh_coordinates_rest, _scales, _quaternions.

Implemented with numpy structured arrays (binary_little_endian 1.0) — no
plyfile dependency.  torch (CPU) is used only to unpickle ``.pt`` files.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

from autovfx_tpu.core.gaussians import Gaussians

_HEADER_RE = re.compile(rb"end_header\n")


def _build_dtype(num_rest: int) -> np.dtype:
    names = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(num_rest)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    return np.dtype([(n, "<f4") for n in names])


def save_ply(path: str, g: Gaussians, compact: bool = True) -> None:
    """Write a vanilla-3DGS-compatible binary PLY."""
    if compact:
        g = g.compact()
    n = g.capacity
    k_rest = g.sh_rest.shape[1]
    dtype = _build_dtype(3 * k_rest)
    data = np.zeros(n, dtype=dtype)
    xyz = np.asarray(g.xyz)
    data["x"], data["y"], data["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    sh_dc = np.asarray(g.sh_dc)
    for i in range(3):
        data[f"f_dc_{i}"] = sh_dc[:, i]
    # channel-major flatten of (N, K-1, 3) -> (N, 3, K-1)
    rest = np.asarray(g.sh_rest).transpose(0, 2, 1).reshape(n, -1)
    for i in range(3 * k_rest):
        data[f"f_rest_{i}"] = rest[:, i]
    data["opacity"] = np.asarray(g.opacity_logit)
    log_scales = np.asarray(g.log_scales)
    for i in range(3):
        data[f"scale_{i}"] = log_scales[:, i]
    quats = np.asarray(g.quats)
    for i in range(4):
        data[f"rot_{i}"] = quats[:, i]

    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {name}\n" for name in dtype.names)
        + "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())


def _parse_ply_header(raw: bytes):
    end = _HEADER_RE.search(raw)
    if end is None:
        raise ValueError("not a PLY file (no end_header)")
    header = raw[: end.end()].decode("ascii")
    lines = header.strip().split("\n")
    if lines[0] != "ply":
        raise ValueError("not a PLY file")
    fmt = next(l for l in lines if l.startswith("format"))
    if "binary_little_endian" not in fmt:
        raise ValueError(f"unsupported PLY format: {fmt}")
    count = None
    props = []
    in_vertex = False
    for line in lines:
        if line.startswith("element"):
            _, name, cnt = line.split()
            in_vertex = name == "vertex"
            if in_vertex:
                count = int(cnt)
        elif line.startswith("property") and in_vertex:
            _, ptype, pname = line.split()
            if ptype not in ("float", "float32"):
                raise ValueError(f"unsupported property type {ptype}")
            props.append(pname)
    return count, props, end.end()


def load_ply(path: str) -> Gaussians:
    """Read a vanilla-3DGS PLY into a Gaussians pytree (load_ply parity)."""
    import jax.numpy as jnp

    with open(path, "rb") as f:
        raw = f.read()
    count, props, offset = _parse_ply_header(raw)
    dtype = np.dtype([(p, "<f4") for p in props])
    data = np.frombuffer(raw, dtype=dtype, count=count, offset=offset)

    xyz = np.stack([data["x"], data["y"], data["z"]], axis=1)
    sh_dc = np.stack([data[f"f_dc_{i}"] for i in range(3)], axis=1)
    rest_names = sorted(
        (p for p in props if p.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    n_rest = len(rest_names)
    k_rest = n_rest // 3
    if n_rest:
        rest = np.stack([data[p] for p in rest_names], axis=1)
        sh_rest = rest.reshape(count, 3, k_rest).transpose(0, 2, 1)
    else:
        sh_rest = np.zeros((count, 0, 3), np.float32)
    opacity = data["opacity"]
    log_scales = np.stack([data[f"scale_{i}"] for i in range(3)], axis=1)
    quats = np.stack([data[f"rot_{i}"] for i in range(4)], axis=1)

    return Gaussians(
        xyz=jnp.asarray(xyz),
        sh_dc=jnp.asarray(sh_dc),
        sh_rest=jnp.asarray(sh_rest),
        log_scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats),
        opacity_logit=jnp.asarray(opacity),
        active=jnp.ones((count,), bool),
    )


def load_sugar_pt(path: str) -> Gaussians:
    """Read a SuGaR ``.pt`` checkpoint (scene_representation.py:196-215).

    SuGaR stores raw parameter tensors: _points (N,3), all_densities (N,1)
    pre-sigmoid opacities, _sh_coordinates_dc (N,1,3), _sh_coordinates_rest
    (N,K-1,3), _scales (N,3) log-scales, _quaternions (N,4).
    """
    import jax.numpy as jnp
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    to_np = lambda key: sd[key].detach().cpu().numpy().astype(np.float32)
    xyz = to_np("_points")
    densities = to_np("all_densities").reshape(-1)
    sh_dc = to_np("_sh_coordinates_dc").reshape(len(xyz), 3)
    sh_rest = to_np("_sh_coordinates_rest")
    scales = to_np("_scales")
    quats = to_np("_quaternions")
    return Gaussians(
        xyz=jnp.asarray(xyz),
        sh_dc=jnp.asarray(sh_dc),
        sh_rest=jnp.asarray(sh_rest),
        log_scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        opacity_logit=jnp.asarray(densities),
        active=jnp.ones((len(xyz),), bool),
    )


def load_gaussians(path: str) -> Gaussians:
    """Dispatch on extension like scene_representation.load_scene."""
    if path.endswith(".pt"):
        return load_sugar_pt(path)
    if path.endswith(".ply"):
        return load_ply(path)
    raise ValueError(f"unsupported gaussian checkpoint: {path}")


def save_npz(path: str, g: Gaussians) -> None:
    """Native fast checkpoint (orbax-free, single-file numpy archive)."""
    np.savez_compressed(
        path,
        xyz=np.asarray(g.xyz),
        sh_dc=np.asarray(g.sh_dc),
        sh_rest=np.asarray(g.sh_rest),
        log_scales=np.asarray(g.log_scales),
        quats=np.asarray(g.quats),
        opacity_logit=np.asarray(g.opacity_logit),
        active=np.asarray(g.active),
    )


def load_npz(path: str) -> Gaussians:
    import jax.numpy as jnp

    z: Dict[str, np.ndarray] = dict(np.load(path))
    return Gaussians(**{k: jnp.asarray(v) for k, v in z.items()})
