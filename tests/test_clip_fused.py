"""Fused single-pass edited frame vs the multi-pass reference path.

The fused path (render/clip.py:render_edited_frame_fused) blends the
object splats inside the scene pass and applies the shadow ratio to the
background contribution analytically; it must agree with the multi-pass
compositor away from the ~1px object silhouette band.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import jax.experimental.pallas as pl

from autovfx_tpu.core import cameras as C
from autovfx_tpu.ops import blend_pallas, preprocess_pallas as PP
from autovfx_tpu.ops.rasterize import RasterConfig
from autovfx_tpu.physics.shapes import build_hulls
from autovfx_tpu.render import clip as CL
from autovfx_tpu.render import meshsplat as MS


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(PP.pl, "pallas_call", patched)
    monkeypatch.setattr(blend_pallas.pl, "pallas_call", patched)


def _setup(frames=2):
    from autovfx_tpu.utils.synthetic import make_gaussians

    # background = a ground-plane splat carpet BELOW the object's path,
    # so the multi-pass binary depth_check and the fused per-splat
    # occlusion agree (floating splats in front of the object would
    # differ by design — the fused path resolves those more exactly)
    g = make_gaussians(400, jax.random.PRNGKey(0), spread=1.0)
    xy = np.asarray(g.xyz[:, :2])
    z = np.abs(np.asarray(g.xyz[:, 2])) * 0.02 - 0.4
    g = g.replace(
        xyz=jnp.asarray(
            np.concatenate([xy, z[:, None]], -1), jnp.float32
        )
    )
    cams = C.stack_cameras(
        [
            C.look_at_camera(
                [2.2 * np.cos(a), 2.2 * np.sin(a), 1.2],
                [0, 0, 0.0], [0, 0, 1],
                fx=80.0, fy=80.0, width=96, height=64,
            )
            for a in np.linspace(0.0, 0.6, frames)
        ]
    )
    corners = np.array(
        [[x, y, z] for x in (-0.25, 0.25) for y in (-0.25, 0.25)
         for z in (-0.25, 0.25)], np.float32
    )
    faces = np.array(
        [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
         [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
         [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64
    )
    hull, _, _, _ = build_hulls([corners])
    surf = MS.sample_mesh_surfels(corners, faces, num_samples=3000)
    zs = np.linspace(0.6, 0.3, frames)
    traj_pos = np.stack(
        [np.stack([np.zeros(frames), np.zeros(frames), zs], -1)], 1
    ).astype(np.float32)
    traj_rot = np.tile(np.eye(3, dtype=np.float32), (frames, 1, 1, 1))
    env = (0.3 + 0.7 * np.random.RandomState(1).rand(16, 32, 3)).astype(
        np.float32
    )
    inp = CL.build_clip_inputs(
        bg=g, cams=cams,
        objects=[{"scale": 1.0, "material": {"rgb": [0.9, 0.1, 0.1]}}],
        surfels=[surf], traj_pos=traj_pos, traj_rot=traj_rot,
        hull_shape=hull, env=env, num_lights=8, pack_rows=True,
    )
    cfg = RasterConfig(
        dup_budget=1 << 15, backend="pallas", feature_pack="bf16",
        tile=16, chunk=128,
    )
    return inp, cfg


class TestFusedEditedFrame:
    def test_matches_multipass(self):
        inp, cfg = _setup()
        ref = CL.render_edited_frame(inp, 0, cfg)
        fused = CL.render_edited_frame_fused(
            inp, 0, cfg, obj_dup_budget=1 << 13, shadow_scale=1
        )
        a = np.asarray(ref)
        b = np.asarray(fused)
        assert np.isfinite(b).all()
        assert b.min() >= 0.0 and b.max() <= 1.0
        d = np.abs(a - b).max(axis=-1)
        # agree everywhere except a thin silhouette/depth-edge band
        assert np.quantile(d, 0.95) < 0.06, np.quantile(d, 0.95)
        assert d.mean() < 0.02, d.mean()

    def test_object_visible_and_shadow_cast(self):
        inp, cfg = _setup()
        fused = np.asarray(
            CL.render_edited_frame_fused(
                inp, 0, cfg, obj_dup_budget=1 << 13, shadow_scale=2
            )
        )
        # without the object+shadow, frame = plain bg render
        from autovfx_tpu.ops.rasterize import rasterize_rows

        cam = C.index_camera(inp.cams, 0)
        bg_only = np.asarray(
            rasterize_rows(inp.bg_rows, cam, config=cfg).color
        )
        diff = np.abs(fused - np.clip(bg_only, 0, 1)).max(-1)
        # object inserts bright-red pixels, shadow darkens others
        assert (diff > 0.1).sum() > 20

    def test_scan_clip(self):
        inp, cfg = _setup(frames=2)
        frames = CL.render_clip(inp, 2, cfg, fused=True)
        assert frames.shape[0] == 2
        assert np.isfinite(np.asarray(frames)).all()
