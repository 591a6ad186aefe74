"""Pallas blend kernels vs the reference blend (interpret mode on CPU).

The same kernels run compiled on TPU; these tests validate the kernel
logic (forward parity + custom-VJP gradients) hermetically.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import jax.experimental.pallas as pl

from autovfx_tpu.ops import binning, blend_pallas, blend_ref, projection
from autovfx_tpu.utils.synthetic import make_scene


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # blend modules capture pl at import; patch their reference too
    monkeypatch.setattr(blend_pallas.pl, "pallas_call", patched)


def gather_args(g, cam, budget=1 << 14):
    splats = projection.preprocess(g, cam)
    binned = binning.bin_splats(splats, cam.width, cam.height, budget)
    gid = binned.gid
    opacity = jnp.where(binned.valid, splats.opacity[gid], 0.0)
    return binned, (
        splats.mean2d[gid],
        splats.conic[gid],
        splats.color[gid],
        opacity,
        splats.depth[gid],
    )


class TestForwardParity:
    def test_matches_ref(self):
        g, cam = make_scene(n=200, width=64, height=48, key=0)
        binned, args = gather_args(g, cam)
        t_ref = blend_ref.blend_tiles_ref(binned, *args)
        t_pal = blend_pallas.blend_tiles_pallas(binned, *args)
        np.testing.assert_allclose(
            np.asarray(t_pal.color), np.asarray(t_ref.color), atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(t_pal.depth), np.asarray(t_ref.depth), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(t_pal.alpha), np.asarray(t_ref.alpha), atol=3e-5
        )

    def test_saturated_freeze(self):
        n = 50
        g, cam = make_scene(n=n, width=32, height=32, key=3)
        g = g.replace(
            xyz=0.05 * jax.random.normal(jax.random.PRNGKey(3), (n, 3)),
            opacity_logit=jnp.full((n,), 5.0),
            log_scales=jnp.full((n, 3), np.log(0.3)),
        )
        binned, args = gather_args(g, cam)
        t_ref = blend_ref.blend_tiles_ref(binned, *args)
        t_pal = blend_pallas.blend_tiles_pallas(binned, *args)
        assert float(jnp.max(t_ref.alpha)) > 0.999
        np.testing.assert_allclose(
            np.asarray(t_pal.alpha), np.asarray(t_ref.alpha), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(t_pal.color), np.asarray(t_ref.color), atol=5e-5
        )


class TestBackwardParity:
    def _grads(self, blend_fn, binned, args, seed=7):
        tgt_c = jax.random.uniform(
            jax.random.PRNGKey(seed),
            (binned.tile_start.shape[0], 256, 3),
        )

        def loss(mean2d, conic, color, opacity, depth):
            t = blend_fn(binned, mean2d, conic, color, opacity, depth)
            return (
                jnp.sum((t.color - tgt_c) ** 2)
                + 0.1 * jnp.sum(t.depth**2)
                + 0.2 * jnp.sum(t.alpha**2)
            )

        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)

    def test_grads_match_ref(self):
        g, cam = make_scene(n=120, width=48, height=32, key=1)
        binned, args = gather_args(g, cam)
        g_ref = self._grads(blend_ref.blend_tiles_ref, binned, args)
        g_pal = self._grads(blend_pallas.blend_tiles_pallas, binned, args)
        names = ["mean2d", "conic", "color", "opacity", "depth"]
        for name, a, b in zip(names, g_ref, g_pal):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(b).all(), name
            scale = np.abs(a).max() + 1e-6
            np.testing.assert_allclose(
                b / scale, a / scale, atol=2e-4, err_msg=name
            )

    def test_grads_match_ref_saturated(self):
        n = 40
        g, cam = make_scene(n=n, width=32, height=16, key=5)
        g = g.replace(
            xyz=0.05 * jax.random.normal(jax.random.PRNGKey(5), (n, 3)),
            opacity_logit=jnp.full((n,), 4.0),
            log_scales=jnp.full((n, 3), np.log(0.25)),
        )
        binned, args = gather_args(g, cam)
        g_ref = self._grads(blend_ref.blend_tiles_ref, binned, args)
        g_pal = self._grads(blend_pallas.blend_tiles_pallas, binned, args)
        for name, a, b in zip(
            ["mean2d", "conic", "color", "opacity", "depth"], g_ref, g_pal
        ):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-6
            np.testing.assert_allclose(
                b / scale, a / scale, atol=5e-4, err_msg=name
            )
