"""Image-based lighting: SH-9 irradiance + mirror specular from the envmap.

Replaces the *used subset* of Cycles shading for inserted objects
(SURVEY §2.1 Blender row): a Principled-BSDF-ish model lit by the HDR
environment map — diffuse via the Ramamoorthi-Hanrahan 9-coefficient
irradiance SH, specular via a single mirror-direction envmap sample
scaled by a Schlick-Fresnel/roughness factor.  Materials follow the edit
IR ``Material`` fields (edit_utils.py:107-114: base color / texture,
roughness, metallic; "mirror" override all_rendering.py:1019-1062).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.render.envmap import sample_envmap, uv_to_direction


class Material(NamedTuple):
    base_color: jax.Array = None  # (3,)
    roughness: float = 0.5
    metallic: float = 0.0
    emission: Optional[jax.Array] = None


def envmap_sh9(env: np.ndarray) -> np.ndarray:
    """Host-side: project an equirect map onto 9 SH coefficients (per RGB)."""
    env = np.asarray(env, np.float32)
    h, w, _ = env.shape
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    dirs = np.asarray(
        uv_to_direction(jnp.asarray(np.stack([uu, vv], -1)))
    )  # (H, W, 3)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    basis = np.stack(
        [
            0.282095 * np.ones_like(x),
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3 * z * z - 1),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ],
        axis=-1,
    )  # (H, W, 9)
    sin_theta = np.sin(vv * np.pi)
    d_omega = (2 * np.pi / w) * (np.pi / h) * sin_theta
    sh = np.einsum("hwk,hwc,hw->kc", basis, env, d_omega)
    return sh.astype(np.float32)  # (9, 3)


_A = np.array(
    [np.pi, 2.094395, 2.094395, 2.094395, 0.785398, 0.785398, 0.785398,
     0.785398, 0.785398],
    np.float32,
)


def sh_irradiance(sh: jax.Array, normals: jax.Array) -> jax.Array:
    """Diffuse irradiance E(n)/π for normals (..., 3) from SH-9 (9, 3)."""
    x, y, z = normals[..., 0], normals[..., 1], normals[..., 2]
    basis = jnp.stack(
        [
            0.282095 * jnp.ones_like(x),
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3 * z * z - 1),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ],
        axis=-1,
    )
    a = jnp.asarray(_A)
    e = jnp.einsum("...k,k,kc->...c", basis, a, sh)
    return jnp.maximum(e / jnp.pi, 0.0)


def shade(
    normals: jax.Array,
    view_dirs: jax.Array,
    env: jax.Array,
    env_sh: jax.Array,
    base_color: jax.Array,
    roughness: jax.Array | float = 0.5,
    metallic: jax.Array | float = 0.0,
    emission: jax.Array | None = None,
) -> jax.Array:
    """Per-point shading: albedo·E(n) + Fresnel·env(reflect(v, n)).

    normals/view_dirs (..., 3) unit (view_dirs point *toward* the
    surface); base_color (..., 3) or (3,).
    """
    n = normals
    v = -view_dirs  # outgoing
    ndv = jnp.maximum(jnp.sum(n * v, axis=-1, keepdims=True), 0.0)
    refl = 2.0 * ndv * n - v

    rough = jnp.asarray(roughness)
    metal = jnp.asarray(metallic)
    diffuse = base_color * sh_irradiance(env_sh, n)
    spec_env = sample_envmap(env, refl)
    f0 = 0.04 * (1.0 - metal) + metal * base_color
    fresnel = f0 + (1.0 - f0) * (1.0 - ndv) ** 5
    # crude roughness attenuation of the mirror sample (prefiltering TODO)
    spec = spec_env * fresnel * (1.0 - 0.85 * rough)
    out = diffuse * (1.0 - metal) + spec
    if emission is not None:
        out = out + emission
    return out
