"""The Gaussian splat store — a functional pytree with padded capacity.

Parity target: reference ``sugar/gaussian_splatting/scene/gaussian_model.py``
(GaussianModel:24-417 — log-scale / sigmoid-opacity / normalized-quaternion
activations :26-41, normals :120-128) and the tensor layout of SuGaR ``.pt``
checkpoints read by ``scene_representation.py:196-215``.

TPU-first design: XLA requires static shapes, so the store holds a fixed
*capacity* ``N`` of slots plus an ``active`` mask.  Densification
(clone/split/prune) is expressed as functional re-allocation into the same
capacity (see autovfx_tpu/train/densify.py), growing capacity only on host
between jitted steps.
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from autovfx_tpu.core import quaternion, sh as sh_lib


@flax.struct.dataclass
class Gaussians:
    """A batch of 3D Gaussians (capacity-padded).

    Attributes:
      xyz:            (N, 3) centers, world space.
      sh_dc:          (N, 3) DC SH coefficient per channel.
      sh_rest:        (N, K-1, 3) higher-band SH coefficients (K=(deg+1)^2).
      log_scales:     (N, 3) log of per-axis std-dev.
      quats:          (N, 4) wxyz orientation (unnormalized storage).
      opacity_logit:  (N,) pre-sigmoid opacity.
      active:         (N,) bool — live slots.  Inactive slots must behave as
                      fully transparent (opacity forced to 0).
    """

    xyz: jax.Array
    sh_dc: jax.Array
    sh_rest: jax.Array
    log_scales: jax.Array
    quats: jax.Array
    opacity_logit: jax.Array
    active: jax.Array

    # ---- static-shape helpers -------------------------------------------------

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def sh_degree(self) -> int:
        k = 1 + self.sh_rest.shape[1]
        return int(round(k**0.5)) - 1

    @property
    def num_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))

    # ---- activations (gaussian_model.py:26-41) --------------------------------

    @property
    def scales(self) -> jax.Array:
        return jnp.exp(self.log_scales)

    @property
    def opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity_logit) * self.active.astype(
            self.opacity_logit.dtype
        )

    @property
    def rotations(self) -> jax.Array:
        return quaternion.quat_normalize(self.quats)

    @property
    def sh(self) -> jax.Array:
        """(N, K, 3) full SH coefficient tensor (DC first)."""
        return jnp.concatenate([self.sh_dc[:, None, :], self.sh_rest], axis=1)

    def covariance(self, scaling_modifier: float = 1.0) -> jax.Array:
        """(N, 3, 3) world covariance R S S^T R^T (gaussian_model.py:95-118)."""
        rot = quaternion.quat_to_rotmat(self.rotations)
        s = self.scales * scaling_modifier
        m = rot * s[:, None, :]
        return m @ jnp.swapaxes(m, -1, -2)

    def normals(self, view_dirs: Optional[jax.Array] = None) -> jax.Array:
        """Per-Gaussian normal = min-scale axis, flipped toward the viewer.

        Parity: gaussian_model.py:120-128 (get_normal).
        view_dirs: (N, 3) normalized (center - camera) directions; if given,
        normals are flipped so that dot(normal, view_dir) < 0.
        """
        rot = quaternion.quat_to_rotmat(self.rotations)  # columns = axes
        idx = jnp.argmin(self.log_scales, axis=-1)  # (N,)
        n = jnp.take_along_axis(rot, idx[:, None, None].repeat(3, 1), axis=2)[
            ..., 0
        ]
        if view_dirs is not None:
            flip = jnp.sum(n * view_dirs, axis=-1, keepdims=True) > 0
            n = jnp.where(flip, -n, n)
        return n

    def colors(self, campos: jax.Array, degree: Optional[int] = None) -> jax.Array:
        """(N, 3) view-dependent RGB from SH toward camera position.

        ``degree`` caps the active SH band (reference active_sh_degree);
        bands above 3 are never evaluated, matching the CUDA rasterizer
        which ignores degree-4 coefficients in SuGaR checkpoints.
        """
        deg = self.sh_degree if degree is None else degree
        deg = min(deg, 3)
        dirs = self.xyz - campos[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
        )
        return sh_lib.sh_to_rgb(deg, self.sh, dirs)

    # ---- construction / editing ----------------------------------------------

    @classmethod
    def create(
        cls,
        xyz: jax.Array,
        rgb: Optional[jax.Array] = None,
        sh_degree: int = 3,
        initial_scale: Optional[jax.Array] = None,
        initial_opacity: float = 0.1,
    ) -> "Gaussians":
        """Initialize from a point cloud (gaussian_model.py:134-157 semantics:
        DC from RGB, isotropic scale from 3-NN mean distance, opacity 0.1)."""
        n = xyz.shape[0]
        k = sh_lib.num_sh_coeffs(sh_degree)
        if rgb is None:
            rgb = jnp.full((n, 3), 0.5, dtype=jnp.float32)
        sh_dc = sh_lib.rgb_to_sh(rgb.astype(jnp.float32))
        sh_rest = jnp.zeros((n, k - 1, 3), dtype=jnp.float32)
        if initial_scale is None:
            log_scales = jnp.full((n, 3), jnp.log(0.01), dtype=jnp.float32)
        else:
            log_scales = jnp.log(
                jnp.maximum(initial_scale, 1e-7)
            ).astype(jnp.float32)
            if log_scales.ndim == 1:
                log_scales = jnp.repeat(log_scales[:, None], 3, axis=1)
        quats = jnp.zeros((n, 4), dtype=jnp.float32).at[:, 0].set(1.0)
        op = float(np.log(initial_opacity / (1.0 - initial_opacity)))
        return cls(
            xyz=xyz.astype(jnp.float32),
            sh_dc=sh_dc,
            sh_rest=sh_rest,
            log_scales=log_scales,
            quats=quats,
            opacity_logit=jnp.full((n,), op, dtype=jnp.float32),
            active=jnp.ones((n,), dtype=bool),
        )

    def pad_to(self, capacity: int) -> "Gaussians":
        """Grow to a larger capacity with inactive slots (host-side resize)."""
        n = self.capacity
        if capacity < n:
            raise ValueError(f"cannot shrink capacity {n} -> {capacity}")
        if capacity == n:
            return self
        extra = capacity - n

        def pad(x):
            pad_shape = (extra,) + x.shape[1:]
            return jnp.concatenate([x, jnp.zeros(pad_shape, x.dtype)], axis=0)

        return Gaussians(
            xyz=pad(self.xyz),
            sh_dc=pad(self.sh_dc),
            sh_rest=pad(self.sh_rest),
            log_scales=pad(self.log_scales),
            quats=pad(self.quats).at[n:, 0].set(1.0),
            opacity_logit=pad(self.opacity_logit).at[n:].set(-10.0),
            active=jnp.concatenate(
                [self.active, jnp.zeros((extra,), bool)], axis=0
            ),
        )

    def compact(self) -> "Gaussians":
        """Host-side: drop inactive slots (breaks jit shapes; use between steps)."""
        mask = np.asarray(self.active)
        idx = np.nonzero(mask)[0]
        take = lambda x: jnp.asarray(np.asarray(x)[idx])
        return Gaussians(
            xyz=take(self.xyz),
            sh_dc=take(self.sh_dc),
            sh_rest=take(self.sh_rest),
            log_scales=take(self.log_scales),
            quats=take(self.quats),
            opacity_logit=take(self.opacity_logit),
            active=take(self.active),
        )

    def transformed(
        self,
        scale: float | jax.Array = 1.0,
        rotation_quat: Optional[jax.Array] = None,
        translation: Optional[jax.Array] = None,
        pivot: Optional[jax.Array] = None,
        rotate_sh: bool = False,
    ) -> "Gaussians":
        """Rigid(+uniform scale) transform of the splat cloud.

        Parity: reference ``gaussians_utils.py:85-118`` (transform about the
        initial center: scale → rotate → translate; log-scale add, quaternion
        premultiply).  ``pivot`` defaults to the active-mass mean center.
        ``rotate_sh`` additionally rotates the SH coefficients (the
        reference computes transform_shs but leaves it disabled,
        gaussians_utils.py:105 — opt-in here).
        """
        w = self.active.astype(jnp.float32)[:, None]
        if pivot is None:
            pivot = jnp.sum(self.xyz * w, axis=0) / jnp.maximum(
                jnp.sum(w), 1.0
            )
        xyz = (self.xyz - pivot) * scale
        log_scales = self.log_scales + jnp.log(
            jnp.asarray(scale, jnp.float32)
        )
        quats = self.quats
        if rotation_quat is not None:
            xyz = quaternion.quat_rotate(rotation_quat[None, :], xyz)
            quats = quaternion.quat_multiply(
                rotation_quat[None, :], self.rotations
            )
        xyz = xyz + pivot
        if translation is not None:
            xyz = xyz + translation[None, :]
        out = self.replace(xyz=xyz, log_scales=log_scales, quats=quats)
        if rotate_sh and rotation_quat is not None:
            import numpy as _np

            from autovfx_tpu.core.quaternion import quat_to_rotmat
            from autovfx_tpu.core.sh_rotation import rotate_sh as _rot_sh

            rot = _np.asarray(quat_to_rotmat(rotation_quat))
            new_sh = _rot_sh(out.sh, rot)
            out = out.replace(sh_dc=new_sh[:, 0], sh_rest=new_sh[:, 1:])
        return out


def merge(a: Gaussians, b: Gaussians) -> Gaussians:
    """Concatenate two splat clouds (gaussians_utils.py:71-82).

    SH band counts are aligned by zero-padding the lower-degree one.
    """
    ka, kb = a.sh_rest.shape[1], b.sh_rest.shape[1]
    if ka < kb:
        a = a.replace(
            sh_rest=jnp.concatenate(
                [a.sh_rest, jnp.zeros((a.capacity, kb - ka, 3), jnp.float32)],
                axis=1,
            )
        )
    elif kb < ka:
        b = b.replace(
            sh_rest=jnp.concatenate(
                [b.sh_rest, jnp.zeros((b.capacity, ka - kb, 3), jnp.float32)],
                axis=1,
            )
        )
    cat = lambda x, y: jnp.concatenate([x, y], axis=0)
    return Gaussians(
        xyz=cat(a.xyz, b.xyz),
        sh_dc=cat(a.sh_dc, b.sh_dc),
        sh_rest=cat(a.sh_rest, b.sh_rest),
        log_scales=cat(a.log_scales, b.log_scales),
        quats=cat(a.quats, b.quats),
        opacity_logit=cat(a.opacity_logit, b.opacity_logit),
        active=cat(a.active, b.active),
    )
