"""Camera model + trajectory IO.

Parity targets:
- ``sugar/sugar_scene/cameras.py`` (GSCamera:141, GS<->PyTorch3D conversions)
- ``scene_representation.py:115-189`` (custom_camera_path/<name>.json loader:
  c2w per frame, fl_x/fl_y/cx/cy/w/h intrinsics, COLMAP/OpenCV convention)
- ``blender/all_rendering.py:214-263`` (OpenCV->OpenGL pose transform).

TPU-first: a Camera is a small pytree of f32 arrays so trajectories can be
stacked and vmapped/scanned over; image size is static metadata.
"""
from __future__ import annotations

import json
import math
import os
from typing import List, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

# OpenGL (Blender) camera looks down -z with +y up; OpenCV looks down +z
# with -y up.  c2w_gl = c2w_cv @ diag(1, -1, -1, 1).
_CV_TO_GL = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


@flax.struct.dataclass
class Camera:
    """A pinhole camera in the OpenCV/COLMAP convention (+z forward).

    ``R``/``t`` are the world-to-camera rotation and translation:
    ``p_cam = R @ p_world + t``.
    """

    R: jax.Array  # (3, 3) w2c rotation
    t: jax.Array  # (3,)  w2c translation
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)
    znear: float = flax.struct.field(pytree_node=False, default=0.01)
    zfar: float = flax.struct.field(pytree_node=False, default=100.0)

    # ---- derived quantities ----------------------------------------------------

    @property
    def center(self) -> jax.Array:
        """Camera position in world space (GSCamera.camera_center)."""
        return -jnp.einsum("...ji,...j->...i", self.R, self.t)

    @property
    def c2w(self) -> jax.Array:
        """(4, 4) camera-to-world, OpenCV convention."""
        rt = jnp.swapaxes(self.R, -1, -2)
        top = jnp.concatenate([rt, self.center[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    @property
    def w2c(self) -> jax.Array:
        top = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    @property
    def tan_half_fovx(self) -> jax.Array:
        return 0.5 * self.width / self.fx

    @property
    def tan_half_fovy(self) -> jax.Array:
        return 0.5 * self.height / self.fy

    @property
    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    def project(self, points_world: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """World points (..., 3) -> pixel coords (..., 2) and view-space depth."""
        from autovfx_tpu.utils.linalg import transform_points

        p_cam = transform_points(points_world, self.R, self.t)
        z = p_cam[..., 2]
        u = self.fx * p_cam[..., 0] / z + self.cx
        v = self.fy * p_cam[..., 1] / z + self.cy
        return jnp.stack([u, v], axis=-1), z

    def ray_directions(self) -> jax.Array:
        """(H, W, 3) world-space ray directions through pixel centers.

        Matches get_ray_directions use in gaussian_renderer/__init__.py:195-203
        (pixel centers at integer coords + 0.5).
        """
        j, i = jnp.meshgrid(
            jnp.arange(self.height, dtype=jnp.float32) + 0.5,
            jnp.arange(self.width, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        dirs_cam = jnp.stack(
            [(i - self.cx) / self.fx, (j - self.cy) / self.fy, jnp.ones_like(i)],
            axis=-1,
        )
        from autovfx_tpu.utils.linalg import apply_rotation_t

        return apply_rotation_t(dirs_cam, self.R)  # c2w rotation applied

    def resized(self, factor: float) -> "Camera":
        """Downscale by ``factor`` (scene_representation.py:135-141)."""
        return self.replace(
            fx=self.fx / factor,
            fy=self.fy / factor,
            cx=self.cx / factor,
            cy=self.cy / factor,
            width=round(self.width / factor),
            height=round(self.height / factor),
        )


def camera_from_c2w(
    c2w: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
) -> Camera:
    """Build a Camera from an OpenCV-convention camera-to-world matrix."""
    c2w = np.asarray(c2w, dtype=np.float64)
    w2c = np.linalg.inv(c2w)
    return Camera(
        R=jnp.asarray(w2c[:3, :3], jnp.float32),
        t=jnp.asarray(w2c[:3, 3], jnp.float32),
        fx=jnp.float32(fx),
        fy=jnp.float32(fy),
        cx=jnp.float32(cx),
        cy=jnp.float32(cy),
        width=int(width),
        height=int(height),
    )


def look_at_camera(
    eye: np.ndarray,
    target: np.ndarray,
    up: np.ndarray,
    fx: float,
    fy: float,
    width: int,
    height: int,
) -> Camera:
    """OpenCV-convention look-at camera (used by trajectory sampling,
    parity: dataset_utils/sample_custom_traj.py:69-108)."""
    eye = np.asarray(eye, np.float64)
    forward = np.asarray(target, np.float64) - eye
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = forward
    c2w[:3, 3] = eye
    return camera_from_c2w(c2w, fx, fy, width / 2.0, height / 2.0, width, height)


def stack_cameras(cams: List[Camera]) -> Camera:
    """Stack same-size cameras into a batched Camera pytree for scan/vmap."""
    assert len({(c.width, c.height) for c in cams}) == 1
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def index_camera(batch: Camera, i) -> Camera:
    return jax.tree_util.tree_map(lambda x: x[i], batch)


def num_cameras(batch: Camera) -> int:
    return batch.R.shape[0]


# ---- trajectory / dataset IO ----------------------------------------------------


def load_custom_trajectory(path: str, downscale_factor: float = 1.0):
    """Load a ``custom_camera_path/<name>.json`` trajectory.

    Parity: scene_representation.py:120-166 — frames sorted by filename,
    c2w stored directly, shared intrinsics, optional downscale.

    Returns (batched Camera, c2w array (F,4,4), filenames).
    """
    with open(path, "r") as f:
        traj = json.load(f)
    fx, fy, cx, cy = traj["fl_x"], traj["fl_y"], traj["cx"], traj["cy"]
    w, h = traj["w"], traj["h"]
    if downscale_factor > 1.0:
        h = round(h / downscale_factor)
        w = round(w / downscale_factor)
        fx, fy = fx / downscale_factor, fy / downscale_factor
        cx, cy = cx / downscale_factor, cy / downscale_factor
    frames = sorted(traj["frames"], key=lambda fr: fr["filename"])
    c2ws = np.array([fr["transform_matrix"] for fr in frames], np.float64)
    cams = [
        camera_from_c2w(c2w, fx, fy, cx, cy, w, h) for c2w in c2ws
    ]
    names = [fr["filename"] for fr in frames]
    return stack_cameras(cams), c2ws.astype(np.float32), names


def save_custom_trajectory(path: str, cams: Camera, names=None) -> None:
    """Write the reference's trajectory JSON schema."""
    n = num_cameras(cams)
    if names is None:
        names = [f"{i:05d}.png" for i in range(n)]
    c2w = np.asarray(cams.c2w)
    payload = {
        "fl_x": float(np.asarray(cams.fx)[0]),
        "fl_y": float(np.asarray(cams.fy)[0]),
        "cx": float(np.asarray(cams.cx)[0]),
        "cy": float(np.asarray(cams.cy)[0]),
        "w": int(cams.width),
        "h": int(cams.height),
        "frames": [
            {"filename": names[i], "transform_matrix": c2w[i].tolist()}
            for i in range(n)
        ],
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def opencv_to_opengl_c2w(c2w_cv: np.ndarray) -> np.ndarray:
    """OpenCV c2w -> OpenGL/Blender c2w (all_rendering.py camera setup)."""
    return np.asarray(c2w_cv, np.float32) @ _CV_TO_GL


def opengl_to_opencv_c2w(c2w_gl: np.ndarray) -> np.ndarray:
    return np.asarray(c2w_gl, np.float32) @ _CV_TO_GL
