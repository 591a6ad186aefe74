"""Fused Pallas preprocess+pack vs the XLA preprocess (interpret mode).

The fused kernel (`ops/preprocess_pallas.py`) is the inference fast
path; it must agree with the differentiable XLA preprocess
(`ops/projection.py`, itself validated against the CUDA oracle) up to
bf16 feature-packing tolerance and ±1 px of boundary rounding.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import jax.experimental.pallas as pl

from autovfx_tpu.ops import blend_pallas, preprocess_pallas as PP, projection
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.utils.synthetic import make_scene


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(PP.pl, "pallas_call", patched)
    monkeypatch.setattr(blend_pallas.pl, "pallas_call", patched)


def _unpack_pair(row):
    """Split a bf16-paired f32 row back into (hi, lo) float arrays."""
    bits = jax.lax.bitcast_convert_type(row, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    lo = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    return hi, lo


class TestFusedPreprocessParity:
    def _compare(self, n, key, tile=16):
        g, cam = make_scene(n=n, width=64, height=48, key=key)
        rows = PP.pack_scene_rows(g)
        ps = PP.preprocess_packed(rows, g.capacity, cam, tile=tile)
        ref = projection.preprocess(g, cam, tile=tile)
        feat_ref = blend_pallas.pack_gaussian_features_8(ref)

        nn = g.capacity
        s = ps.splats
        # integer binning fields: identical except where a boundary
        # rounds differently (float eps in m2x/rsqrt); allow rect off
        # by <=1 tile on a tiny fraction of splats
        for name, a, b, tol in [
            ("radius", s.radius[:nn], ref.radius, 1),
            ("tile_min", s.tile_min[:nn], ref.tile_min, 1),
            ("tile_max", s.tile_max[:nn], ref.tile_max, 1),
        ]:
            d = np.abs(np.asarray(a, np.int64) - np.asarray(b, np.int64))
            frac = (d > 0).mean()
            assert d.max() <= tol, (name, d.max())
            assert frac < 0.02, (name, frac)
        np.testing.assert_allclose(
            np.asarray(s.depth[:nn]), np.asarray(ref.depth),
            rtol=1e-5, atol=1e-5,
        )
        # padding must be inert
        assert int(np.asarray(s.tiles_touched[nn:]).max(initial=0)) == 0

        # packed features: mean2d/conic f32-exact-ish, colors bf16
        f, fr = ps.feat, feat_ref
        np.testing.assert_allclose(
            np.asarray(f[0, :nn]), np.asarray(fr[0, :nn]),
            rtol=1e-4, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(f[1, :nn]), np.asarray(fr[1, :nn]),
            rtol=1e-4, atol=2e-3,
        )
        for r in (2, 3, 4):
            np.testing.assert_allclose(
                np.asarray(f[r, :nn]), np.asarray(fr[r, :nn]),
                rtol=2e-3, atol=2e-3,
            )
        # log-opacity row: match where the splat is live in both
        live = (np.asarray(ref.radius) > 0) & (
            np.asarray(s.radius[:nn]) > 0
        )
        np.testing.assert_allclose(
            np.asarray(f[5, :nn])[live], np.asarray(fr[5, :nn])[live],
            rtol=1e-3, atol=1e-3,
        )
        r_hi, g_lo = _unpack_pair(f[6, :nn])
        r_hi2, g_lo2 = _unpack_pair(fr[6, :nn])
        np.testing.assert_allclose(
            np.asarray(r_hi), np.asarray(r_hi2), atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(g_lo), np.asarray(g_lo2), atol=2e-2
        )
        b_hi, d_lo = _unpack_pair(f[7, :nn])
        b_hi2, d_lo2 = _unpack_pair(fr[7, :nn])
        np.testing.assert_allclose(
            np.asarray(b_hi), np.asarray(b_hi2), atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(d_lo), np.asarray(d_lo2), atol=5e-2
        )

    def test_small_scene(self):
        self._compare(n=300, key=0)

    def test_scene_with_inactive(self):
        g, cam = make_scene(n=256, width=64, height=48, key=2)
        g = g.replace(
            active=g.active & (jnp.arange(g.capacity) % 3 != 0)
        )
        rows = PP.pack_scene_rows(g)
        ps = PP.preprocess_packed(rows, g.capacity, cam, tile=16)
        ref = projection.preprocess(g, cam, tile=16)
        inactive = ~np.asarray(g.active)
        assert np.asarray(ps.splats.tiles_touched[: g.capacity])[
            inactive
        ].max(initial=0) == 0
        assert np.asarray(ref.tiles_touched)[inactive].max(initial=0) == 0

    def test_end_to_end_render(self):
        """Full rasterize through packed_rows vs the standard path."""
        g, cam = make_scene(n=400, width=64, height=48, key=1)
        cfg = RasterConfig(
            dup_budget=1 << 14, backend="pallas", feature_pack="bf16"
        )
        out_ref = rasterize(g, cam, config=cfg)
        rows = PP.pack_scene_rows(g)
        out_fused = rasterize(g, cam, config=cfg, packed_rows=rows)
        d = np.abs(np.asarray(out_ref.color) - np.asarray(out_fused.color))
        assert d.max() < 2e-2, d.max()
        da = np.abs(np.asarray(out_ref.alpha) - np.asarray(out_fused.alpha))
        assert da.max() < 2e-2
        assert out_fused.radii.shape == out_ref.radii.shape
