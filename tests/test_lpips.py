"""LPIPS (utils/lpips_jax.py) + masked inpaint-retrain loss tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autovfx_tpu.utils import lpips_jax as LP


def _img(key, h=64, w=64):
    return jax.random.uniform(jax.random.PRNGKey(key), (h, w, 3))


class TestLPIPS:
    def test_zero_for_identical(self):
        a = _img(0)
        d = LP.lpips_distance(a, a)
        assert float(d) < 1e-6

    def test_positive_and_symmetric(self):
        a, b = _img(0), _img(1)
        d1 = float(LP.lpips_distance(a, b))
        d2 = float(LP.lpips_distance(b, a))
        assert d1 > 0
        np.testing.assert_allclose(d1, d2, rtol=1e-5)

    def test_monotone_in_perturbation(self):
        a = _img(0)
        noise = jax.random.normal(jax.random.PRNGKey(2), a.shape)
        d_small = float(LP.lpips_distance(a, a + 0.02 * noise))
        d_big = float(LP.lpips_distance(a, a + 0.2 * noise))
        assert d_big > d_small > 0

    def test_blur_vs_noise_perceptual(self):
        """A shifted smooth image is perceptually closer than white
        noise of equal L2 — the property pixel metrics lack."""
        yy, xx = np.mgrid[0:64, 0:64] / 64.0
        a = np.stack(
            [
                0.5 + 0.4 * np.sin(4 * np.pi * xx),
                0.5 + 0.4 * np.cos(3 * np.pi * yy),
                0.5 + 0.3 * np.sin(2 * np.pi * (xx + yy)),
            ],
            axis=-1,
        ).astype(np.float32)
        shifted = np.roll(a, 2, axis=1)
        rng = np.random.RandomState(0)
        l2 = np.sqrt(((a - shifted) ** 2).mean())
        noisy = np.clip(a + rng.randn(*a.shape) * l2, 0, 1)
        d_shift = float(LP.lpips_distance(jnp.asarray(a),
                                          jnp.asarray(shifted)))
        d_noise = float(LP.lpips_distance(jnp.asarray(a),
                                          jnp.asarray(noisy)))
        assert d_shift < d_noise

    def test_masked_distance_ignores_outside(self):
        a = _img(0)
        b = np.asarray(a).copy()
        b[:32] = 0.0  # corrupt top half
        b = jnp.asarray(b)
        mask_top = jnp.zeros((64, 64)).at[:32].set(1.0)
        mask_bot = jnp.zeros((64, 64)).at[32:].set(1.0)
        d_top = float(LP.lpips_distance(a, b, mask=mask_top))
        d_bot = float(LP.lpips_distance(a, b, mask=mask_bot))
        assert d_top > 5 * max(d_bot, 1e-6)

    def test_differentiable(self):
        a, b = _img(0, 32, 32), _img(1, 32, 32)
        grad = jax.grad(lambda x: LP.lpips_distance(x, b))(a)
        assert np.isfinite(np.asarray(grad)).all()
        assert np.abs(np.asarray(grad)).max() > 0

    def test_metrics_wrapper(self):
        from autovfx_tpu.utils.metrics import lpips, lpips_available

        assert lpips_available()
        v = lpips(np.asarray(_img(0)), np.asarray(_img(1)))
        assert v is not None and v > 0

    def test_weights_file_roundtrip(self, tmp_path):
        """A weights .npz (torch OIHW layout) loads and evaluates."""
        rng = np.random.RandomState(0)
        data = {}
        cin = 3
        for i, (cout, _) in enumerate(LP._VGG_PLAN):
            data[f"conv{i}_w"] = rng.randn(cout, cin, 3, 3).astype(
                np.float32
            ) * 0.05
            data[f"conv{i}_b"] = np.zeros((cout,), np.float32)
            cin = cout
        for k, t in enumerate(LP._TAPS):
            data[f"lin{k}"] = rng.rand(
                LP._VGG_PLAN[t][0]).astype(np.float32)
        p = tmp_path / "w.npz"
        np.savez(p, **data)
        params = LP.get_params(str(p))
        assert params.source == "file"
        d = float(LP.lpips_distance(_img(0), _img(1), params=params))
        assert np.isfinite(d) and d > 0


class TestInpaintLoss:
    def test_is_large_mask(self):
        from autovfx_tpu.train.inpaint_retrain import is_large_mask

        m = np.zeros((64, 64), bool)
        assert not is_large_mask(m)
        m[10:20, 10:20] = True
        assert not is_large_mask(m)  # 10px < 32
        m[5:45, 5:45] = True
        assert is_large_mask(m)

    def test_masked_inpaint_loss_gradients(self):
        from autovfx_tpu.ops.rasterize import RasterConfig
        from autovfx_tpu.train import trainer as T
        from autovfx_tpu.train.inpaint_retrain import inpaint_loss
        from autovfx_tpu.utils.synthetic import make_scene

        g, cam = make_scene(n=100, width=48, height=48, key=0)
        gt = jnp.zeros((48, 48, 3))
        mask = jnp.zeros((48, 48)).at[8:40, 8:40].set(1.0)
        cfg = T.TrainConfig(
            raster=RasterConfig(dup_budget=1 << 13, backend="ref")
        )
        offset = jnp.zeros((g.capacity, 2))

        def loss(xyz):
            loss_val, _aux = inpaint_loss(
                g.replace(xyz=xyz), offset, cam, gt, mask, cfg,
                use_lpips=True,
            )
            return loss_val

        v, grad = jax.value_and_grad(loss)(g.xyz)
        assert np.isfinite(float(v))
        assert np.isfinite(np.asarray(grad)).all()
