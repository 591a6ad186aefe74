"""Full-clip golden + analytic shading oracles (VERDICT r3 #6).

1. An 8-frame edited clip — physics drop + fire/smoke volume + object/
   shadow passes + composite through ``SceneRepresentation.render_scene``
   — pinned to a committed golden (tests/golden/edited_clip.npz).  This
   pins the de-facto oracle of the reference (its rendered output tree,
   blend_all.py:92-348 + all_rendering.py:2440-2573) across rounds the
   way garden_like_ref.npz pins the rasterizer.

   Regenerate deliberately with:  python tests/test_golden_clip.py

2. Closed-form checks making the Cycles-parity claim falsifiable:
   - sphere-over-plane: cosine-weighted visibility below a sphere of
     radius r at height h is exactly 1 - (r/h)^2; the hull-slab shadow
     path must reproduce it.
   - furnace tests: a uniform envmap must survive SH-9 irradiance,
     GGX prefiltering, and split-sum shading with unit energy.
"""
import os
import sys

import numpy as np
import jax

if __name__ == "__main__":
    # deliberate golden regeneration must run on the SAME platform the
    # test suite uses (conftest forces cpu).  This must happen before
    # any autovfx import can initialize the axon/TPU backend — a golden
    # rendered through the tunnel differs from the CPU render by ~38 dB.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from autovfx_tpu.core import cameras as C, ply_io
from autovfx_tpu.edit import edit_utils as EU, mesh_io
from autovfx_tpu.edit.edit_ir import default_object_info
from autovfx_tpu.edit.scene_representation import (
    SceneParams,
    SceneRepresentation,
)
from autovfx_tpu.utils.synthetic import make_gaussians

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "edited_clip.npz")
FRAMES = 8
W, H = 64, 48


def build_clip_scene(root: str) -> SceneRepresentation:
    """Deterministic kitchen-sink edit: red physics box dropping onto
    the ground + a burning torch emitting a smoke/fire volume."""
    from test_edit import box_mesh, ground_mesh

    g = make_gaussians(400, jax.random.PRNGKey(0), spread=1.5,
                       scale_range=(0.02, 0.08))
    g = g.replace(xyz=g.xyz.at[:, 2].multiply(0.1))
    ply_io.save_ply(os.path.join(root, "scene.ply"), g)
    mesh_io.save_obj(os.path.join(root, "scene_mesh.obj"),
                     ground_mesh())
    cams = C.stack_cameras(
        [
            C.look_at_camera(
                [3 * np.cos(a), 3 * np.sin(a), 1.6], [0, 0, 0],
                [0, 0, 1], fx=50.0, fy=50.0, width=W, height=H,
            )
            for a in np.linspace(0, np.pi / 3, FRAMES)
        ]
    )
    os.makedirs(os.path.join(root, "custom_camera_path"), exist_ok=True)
    C.save_custom_trajectory(
        os.path.join(root, "custom_camera_path/clip.json"), cams
    )
    scene = SceneRepresentation(
        SceneParams(
            source_path=root, model_path=root,
            gaussians_ckpt_path=os.path.join(root, "scene.ply"),
            scene_mesh_path=os.path.join(root, "scene_mesh.obj"),
            custom_traj_name="clip",
            cache_dir=os.path.join(root, "cache"),
            dup_budget=1 << 14,
            light_samples=8,
        )
    )
    # physics drop with a colored material
    box_path = os.path.join(root, "box.obj")
    mesh_io.save_obj(box_path, box_mesh(0.5, color=(0.9, 0.1, 0.1)))
    box = default_object_info()
    box["object_name"] = "red box"
    box["object_id"] = "goldbox1"
    box["object_path"] = box_path
    box["pos"] = np.array([0.3, 0.0, 1.2], np.float32)
    box["scale"] = 0.3
    box = EU.allow_physics(box)
    mat = EU.init_material()
    mat.rgb = [0.9, 0.15, 0.1]
    mat.roughness = 0.4
    box = EU.apply_material(box, mat)
    EU.insert_object(scene, box)
    # burning torch: fire + smoke volume through the same clip
    torch_path = os.path.join(root, "torch.obj")
    mesh_io.save_obj(torch_path, box_mesh(0.5, color=(0.9, 0.5, 0.1)))
    torch = default_object_info()
    torch["object_name"] = "torch"
    torch["object_id"] = "goldtorch"
    torch["object_path"] = torch_path
    torch["pos"] = np.array([-0.5, 0.4, 0.25], np.float32)
    torch["scale"] = 0.25
    EU.insert_object(scene, torch)
    EU.add_fire(scene, torch)
    return scene


def render_clip(root: str) -> np.ndarray:
    return np.asarray(build_clip_scene(root).render_scene(save=False))


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return -10.0 * np.log10(max(mse, 1e-12))


@pytest.mark.slow
class TestGoldenClip:
    def test_matches_committed_golden(self, tmp_path):
        gold = np.load(GOLDEN)["frames"].astype(np.float32)
        frames = render_clip(str(tmp_path))
        assert frames.shape == gold.shape == (FRAMES, H, W, 3)
        assert np.isfinite(frames).all()
        for i in range(FRAMES):
            p = _psnr(frames[i], gold[i])
            # the golden is stored f16 (~0.0005 quantization -> ~66 dB
            # ceiling); 40 dB pins semantics while allowing FP drift
            assert p >= 40.0, f"frame {i}: PSNR {p:.2f} dB vs golden"

    def test_clip_is_actually_edited(self, tmp_path):
        """The golden isn't a background-only render: object + smoke
        visibly present and the box falls between first/last frame."""
        gold = np.load(GOLDEN)["frames"].astype(np.float32)
        rb = np.load(GOLDEN, allow_pickle=False)
        z0, z7 = float(rb["box_z0"]), float(rb["box_z7"])
        assert z7 < z0 - 0.2, "box did not fall in the golden clip"
        assert gold.std(axis=(1, 2, 3)).min() > 0.01


class TestSphereShadowOracle:
    """Cosine-weighted visibility under a sphere: exactly 1 - (r/h)^2."""

    R, HGT = 0.3, 1.0  # sphere radius / height above the surface point

    def _sphere_planes(self, center, k=256):
        """Circumscribed tangent-plane hull of the sphere: n·x <= n·c+r
        for k Fibonacci-uniform normals (over-estimates occlusion by
        O(1/k) only)."""
        i = np.arange(k, dtype=np.float64)
        ga = np.pi * (3.0 - np.sqrt(5.0))
        z = 1.0 - 2.0 * (i + 0.5) / k
        rr = np.sqrt(np.maximum(1.0 - z * z, 0.0))
        n = np.stack([rr * np.cos(ga * i), rr * np.sin(ga * i), z], -1)
        d = n @ np.asarray(center, np.float64) + self.R
        return (
            jnp.asarray(np.concatenate([n, d[:, None]], -1), jnp.float32),
            jnp.ones((k,), bool),
        )

    def _cosine_dirs(self, k=4096):
        """Deterministic cosine-weighted hemisphere directions (uniform
        low-discrepancy disk -> project up); equal weights then make
        the weighted ratio the cosine-weighted visibility integral."""
        i = np.arange(k, dtype=np.float64)
        r = np.sqrt((i + 0.5) / k)
        th = np.pi * (3.0 - np.sqrt(5.0)) * i
        x, y = r * np.cos(th), r * np.sin(th)
        z = np.sqrt(np.maximum(1.0 - r * r, 0.0))
        return jnp.asarray(np.stack([x, y, z], -1), jnp.float32)

    def test_ray_hits_hull_matches_closed_form(self):
        from autovfx_tpu.render.shadow import ray_hits_hull

        planes, mask = self._sphere_planes([0.0, 0.0, self.HGT])
        dirs = self._cosine_dirs()
        origin = jnp.zeros((dirs.shape[0], 3), jnp.float32)
        hit = np.asarray(ray_hits_hull(origin, dirs, planes, mask))
        vis = 1.0 - hit.mean()
        want = 1.0 - (self.R / self.HGT) ** 2
        assert abs(vis - want) < 0.02, (vis, want)

    def test_shadow_ratio_map_center_pixel(self):
        """The production pass (backprojection + hull slabs + weighted
        ratio) reproduces the same closed form at the pixel under the
        sphere."""
        from autovfx_tpu.render.shadow import shadow_ratio_map

        cam = C.look_at_camera(
            [0.0, 1e-4, 2.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0],
            fx=64.0, fy=64.0, width=32, height=32,
        )
        depth = jnp.full((32, 32), 2.0, jnp.float32)
        alpha = jnp.ones((32, 32), jnp.float32)
        planes, mask = self._sphere_planes([0.0, 0.0, self.HGT])
        dirs = self._cosine_dirs(2048)
        w = jnp.ones((dirs.shape[0],), jnp.float32)
        ratio = np.asarray(
            shadow_ratio_map(
                cam, depth, alpha, dirs, w, planes[None], mask[None],
                bias=1e-3,
            )
        )
        want = 1.0 - (self.R / self.HGT) ** 2
        got = ratio[16, 16]
        assert abs(got - want) < 0.03, (got, want)
        # far corner pixels see (almost) the whole sky
        assert ratio[0, 0] > want + 0.02


class TestFurnace:
    """Uniform-envmap energy conservation through the IBL stack
    (the split-sum pipeline all_rendering.py's Cycles passes are being
    replaced by: render/ibl.py:96-233,268-319)."""

    def test_sh9_irradiance_uniform(self):
        from autovfx_tpu.render.ibl import envmap_sh9, sh_irradiance

        env = np.ones((16, 32, 3), np.float32)
        sh = jnp.asarray(envmap_sh9(env))
        n = jnp.asarray(
            [[0, 0, 1.0], [1, 0, 0], [0.577, 0.577, 0.577]], jnp.float32
        )
        irr = np.asarray(sh_irradiance(sh, n))
        np.testing.assert_allclose(irr, 1.0, atol=0.02)

    def test_ggx_prefilter_preserves_uniform(self):
        from autovfx_tpu.render.ibl import (
            prefilter_envmap_ggx,
            sample_envmap_stack,
        )

        env = jnp.ones((16, 32, 3), jnp.float32)
        stack = prefilter_envmap_ggx(env)
        dirs = jnp.asarray(
            [[0, 0, 1.0], [0.6, -0.64, 0.48]], jnp.float32
        )
        for rough in (0.05, 0.4, 0.9):
            out = np.asarray(
                sample_envmap_stack(
                    stack, dirs, jnp.full((2,), rough, jnp.float32)
                )
            )
            np.testing.assert_allclose(out, 1.0, atol=0.05)

    def test_split_sum_white_furnace(self):
        """Perfect mirror metal (F0=1) head-on in a unit uniform env:
        reflected energy = scale+bias of the env-BRDF ≈ 1 for smooth
        surfaces, never exceeding 1 (+2 % tolerance) at any roughness
        (single-scatter split-sum loses energy at high roughness — the
        known approximation, not a bug)."""
        from autovfx_tpu.render.ibl import env_brdf_approx

        ndv = jnp.asarray([1.0, 0.8, 0.5])
        for rough, lo in ((0.05, 0.93), (0.3, 0.8), (0.8, 0.5)):
            a, b = env_brdf_approx(ndv, rough)
            total = np.asarray(a + b)
            assert (total <= 1.02).all(), (rough, total)
            assert (total >= lo).all(), (rough, total)

    def test_shade_uniform_env_diffuse(self):
        from autovfx_tpu.render.ibl import envmap_sh9, shade

        env = jnp.ones((16, 32, 3), jnp.float32)
        sh = jnp.asarray(envmap_sh9(np.ones((16, 32, 3), np.float32)))
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        v = jnp.asarray([[0.0, 0.0, -1.0]])  # toward the surface
        out = np.asarray(
            shade(n, v, env, sh, jnp.ones(3), roughness=1.0, metallic=0.0)
        )
        # white lambertian + 4 % dielectric specular in a unit furnace:
        # close to 1, bounded by energy conservation + approx slack
        assert 0.9 <= float(out.mean()) <= 1.1, out


if __name__ == "__main__":
    # (platform already forced to cpu at import time, see module top)
    import tempfile

    root = tempfile.mkdtemp(prefix="golden_clip_")
    scene = build_clip_scene(root)
    frames = np.asarray(scene.render_scene(save=False))
    rb = scene.rb_transform["goldbox1"]
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(
        GOLDEN,
        frames=frames.astype(np.float16),
        box_z0=np.float32(rb["0"]["pos"][2]),
        box_z7=np.float32(rb[str(FRAMES - 1)]["pos"][2]),
    )
    print(f"wrote {GOLDEN}: {frames.shape}, "
          f"box z {rb['0']['pos'][2]:.3f} -> "
          f"{rb[str(FRAMES - 1)]['pos'][2]:.3f}")
