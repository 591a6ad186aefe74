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
    feat_g = blend_pallas.pack_gaussian_features(splats)
    return binned, feat_g[:, binned.gid]


class TestForwardParity:
    def test_matches_ref(self):
        g, cam = make_scene(n=200, width=64, height=48, key=0)
        binned, feat = gather_args(g, cam)
        t_ref = blend_ref.blend_tiles_ref_from_feat(binned, feat)
        t_pal = blend_pallas.blend_tiles_pallas(binned, feat)
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
        binned, feat = gather_args(g, cam)
        t_ref = blend_ref.blend_tiles_ref_from_feat(binned, feat)
        t_pal = blend_pallas.blend_tiles_pallas(binned, feat)
        assert float(jnp.max(t_ref.alpha)) > 0.999
        np.testing.assert_allclose(
            np.asarray(t_pal.alpha), np.asarray(t_ref.alpha), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(t_pal.color), np.asarray(t_ref.color), atol=5e-5
        )


class TestLinearForwardParity:
    """The v3 linear-space transmittance kernel vs the reference blend
    and vs the legacy log-space kernel (both algos stay available)."""

    def _run(self, algo, binned, feat, tile=16, chunk=256):
        n_tiles = binned.num_tiles_x * binned.num_tiles_y
        return blend_pallas._blend_fwd_call(
            feat, binned.tile_start, binned.tile_chunks,
            n_tiles, binned.num_tiles_x, tile, chunk, algo=algo,
        )

    def test_linear_matches_ref(self):
        g, cam = make_scene(n=200, width=64, height=48, key=0)
        binned, feat = gather_args(g, cam)
        t_ref = blend_ref.blend_tiles_ref_from_feat(binned, feat)
        out = self._run("linear", binned, feat)
        np.testing.assert_allclose(
            np.asarray(jnp.moveaxis(out[:, 0:3, :], 1, 2)),
            np.asarray(t_ref.color), atol=3e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out[:, 4]), np.asarray(t_ref.alpha), atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(out[:, 3]), np.asarray(t_ref.depth), atol=3e-4
        )

    def test_linear_matches_log_saturated(self):
        n = 50
        g, cam = make_scene(n=n, width=32, height=32, key=3)
        g = g.replace(
            xyz=0.05 * jax.random.normal(jax.random.PRNGKey(3), (n, 3)),
            opacity_logit=jnp.full((n,), 5.0),
            log_scales=jnp.full((n, 3), np.log(0.3)),
        )
        binned, feat = gather_args(g, cam)
        t_ref = blend_ref.blend_tiles_ref_from_feat(binned, feat)
        out = self._run("linear", binned, feat)
        assert float(jnp.max(t_ref.alpha)) > 0.999
        np.testing.assert_allclose(
            np.asarray(out[:, 4]), np.asarray(t_ref.alpha), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(jnp.moveaxis(out[:, 0:3, :], 1, 2)),
            np.asarray(t_ref.color), atol=5e-5,
        )

    def test_linear_packed8(self):
        g, cam = make_scene(n=200, width=64, height=48, key=0)
        splats = projection.preprocess(g, cam)
        binned = binning.bin_splats(splats, cam.width, cam.height, 1 << 14)
        f16 = blend_pallas.pack_gaussian_features(splats)
        f8 = blend_pallas.pack_gaussian_features_8(splats)
        out_full = self._run("linear", binned, f16[:, binned.gid])
        out_pack = self._run("linear", binned, f8[:, binned.gid])
        np.testing.assert_allclose(
            np.asarray(out_pack[:, 4]), np.asarray(out_full[:, 4]),
            atol=3e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_pack[:, 0:3]), np.asarray(out_full[:, 0:3]),
            atol=1.5e-2,
        )

    def test_linear_chunk128(self):
        g, cam = make_scene(n=200, width=64, height=64, key=2)
        splats = projection.preprocess(g, cam, tile=32)
        binned = binning.bin_splats(
            splats, cam.width, cam.height, 1 << 14, tile=32, chunk=128
        )
        feat = blend_pallas.pack_gaussian_features(splats)[:, binned.gid]
        t_ref = blend_ref.blend_tiles_ref_from_feat(binned, feat, tile=32)
        out = self._run("linear", binned, feat, tile=32, chunk=128)
        # deeper 32px tiles: the linear product accumulation and ref's
        # log1p chain disagree by ~1e-4 (both are f32 orderings of the
        # same f64 quantity; 1/255 display quantum is 3.9e-3)
        np.testing.assert_allclose(
            np.asarray(out[:, 4]), np.asarray(t_ref.alpha), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(jnp.moveaxis(out[:, 0:3, :], 1, 2)),
            np.asarray(t_ref.color), atol=3e-4,
        )


class TestBackwardParity:
    def _grads(self, blend_fn, binned, feat, seed=7):
        tgt_c = jax.random.uniform(
            jax.random.PRNGKey(seed),
            (binned.tile_start.shape[0], 256, 3),
        )

        def loss(feat):
            t = blend_fn(binned, feat)
            return (
                jnp.sum((t.color - tgt_c) ** 2)
                + 0.1 * jnp.sum(t.depth**2)
                + 0.2 * jnp.sum(t.alpha**2)
            )

        return jax.grad(loss)(feat)

    def test_grads_match_ref(self):
        g, cam = make_scene(n=120, width=48, height=32, key=1)
        binned, feat = gather_args(g, cam)
        g_ref = self._grads(blend_ref.blend_tiles_ref_from_feat, binned, feat)
        g_pal = self._grads(blend_pallas.blend_tiles_pallas, binned, feat)
        a, b = np.asarray(g_ref), np.asarray(g_pal)
        assert np.isfinite(b).all()
        for row in range(10):
            scale = np.abs(a[row]).max() + 1e-6
            np.testing.assert_allclose(
                b[row] / scale, a[row] / scale, atol=2e-4,
                err_msg=f"feat row {row}",
            )

    def test_grads_match_ref_saturated(self):
        n = 40
        g, cam = make_scene(n=n, width=32, height=16, key=5)
        g = g.replace(
            xyz=0.05 * jax.random.normal(jax.random.PRNGKey(5), (n, 3)),
            opacity_logit=jnp.full((n,), 4.0),
            log_scales=jnp.full((n, 3), np.log(0.25)),
        )
        binned, feat = gather_args(g, cam)
        g_ref = self._grads(blend_ref.blend_tiles_ref_from_feat, binned, feat)
        g_pal = self._grads(blend_pallas.blend_tiles_pallas, binned, feat)
        a, b = np.asarray(g_ref), np.asarray(g_pal)
        for row in range(10):
            scale = np.abs(a[row]).max() + 1e-6
            np.testing.assert_allclose(
                b[row] / scale, a[row] / scale, atol=5e-4,
                err_msg=f"feat row {row}",
            )


class TestPackedFastPath:
    def test_bf16_pack_matches_f32(self):
        g, cam = make_scene(n=200, width=64, height=48, key=0)
        splats = projection.preprocess(g, cam)
        binned = binning.bin_splats(splats, cam.width, cam.height, 1 << 14)
        f16 = blend_pallas.pack_gaussian_features(splats)
        f8 = blend_pallas.pack_gaussian_features_8(splats)
        assert f8.shape[0] == blend_pallas.FEAT8
        n_tiles = binned.num_tiles_x * binned.num_tiles_y
        out_full = blend_pallas._blend_fwd_call(
            f16[:, binned.gid], binned.tile_start, binned.tile_chunks,
            n_tiles, binned.num_tiles_x, 16, 256,
        )
        out_pack = blend_pallas._blend_fwd_call(
            f8[:, binned.gid], binned.tile_start, binned.tile_chunks,
            n_tiles, binned.num_tiles_x, 16, 256,
        )
        # colors/depth carry bf16 (~0.4%) error; alpha path is exact f32
        np.testing.assert_allclose(
            np.asarray(out_pack[:, 4]), np.asarray(out_full[:, 4]),
            atol=3e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_pack[:, 0:3]), np.asarray(out_full[:, 0:3]),
            atol=1.5e-2,
        )
        d_full = np.asarray(out_full[:, 3])
        d_pack = np.asarray(out_pack[:, 3])
        np.testing.assert_allclose(
            d_pack, d_full, rtol=1e-2, atol=0.05
        )

    def test_unpack_roundtrip(self):
        a = jnp.asarray(np.random.RandomState(0).rand(1, 256).astype(np.float32))
        b = jnp.asarray(np.random.RandomState(1).rand(1, 256).astype(np.float32))
        packed = blend_pallas._pack_bf16_pair(a[0], b[0])[None, :]
        hi, lo = blend_pallas._unpack_bf16_pair(packed)
        np.testing.assert_allclose(np.asarray(hi), np.asarray(a), rtol=4e-3)
        np.testing.assert_allclose(np.asarray(lo), np.asarray(b), rtol=4e-3)




class TestCompactSegments:
    """Pad-free binning (pad_mode="none") + edge-masked kernel parity.

    The compact path sorts live duplicates only and derives EXACT
    (unaligned) tile segments post-sort; the kernel floor-aligns chunk
    DMAs and masks neighbors' duplicates at the segment edges."""

    def test_matches_padded_reference(self):
        g, cam = make_scene(n=400, width=64, height=48, key=0)
        splats = projection.preprocess(g, cam)
        b0 = binning.bin_splats(splats, cam.width, cam.height, 1 << 14)
        feat = blend_pallas.pack_gaussian_features(splats)
        t_ref = blend_ref.blend_tiles_ref_from_feat(b0, feat[:, b0.gid])

        b1 = binning.bin_splats(
            splats, cam.width, cam.height, 1 << 14, pad_mode="none"
        )
        # live duplicate count identical; no pad slots at all
        assert int(b1.valid.sum()) == int(b0.valid.sum())
        assert int(b1.total_dups) == int(b0.total_dups)
        f8 = blend_pallas.pack_gaussian_features_8(splats)
        gid = jnp.concatenate(
            [b1.gid,
             jnp.full((binning.CHUNK,), f8.shape[1] - 1, jnp.int32)]
        )
        out = blend_pallas._blend_fwd_call(
            f8[:, gid], b1.tile_start, b1.tile_chunks,
            b1.num_tiles_x * b1.num_tiles_y, b1.num_tiles_x, 16, 256,
            tile_count=b1.tile_count,
        )
        np.testing.assert_allclose(
            np.asarray(out[:, 4]), np.asarray(t_ref.alpha), atol=3e-5
        )
        col = np.moveaxis(np.asarray(out[:, 0:3]), 1, 2)
        np.testing.assert_allclose(
            col, np.asarray(t_ref.color), atol=1.5e-2
        )

    def test_segment_bounds_consistent(self):
        g, cam = make_scene(n=300, width=64, height=64, key=2)
        splats = projection.preprocess(g, cam)
        b = binning.bin_splats(
            splats, cam.width, cam.height, 1 << 14, pad_mode="none"
        )
        start = np.asarray(b.tile_start)
        count = np.asarray(b.tile_count)
        tiles = np.asarray(b.tile)
        # starts are the exact sorted-segment boundaries
        ends = start + count
        assert (np.diff(start) >= 0).all()
        for t in range(0, len(start), 7):
            seg = np.nonzero(tiles == t)[0]
            if len(seg):
                assert seg[0] == start[t] and seg[-1] + 1 == ends[t]
            else:
                assert count[t] == 0
        # chunk loop covers [floor(start), end) for every live tile
        base = (start // binning.CHUNK) * binning.CHUNK
        chunks = np.asarray(b.tile_chunks)
        live = count > 0
        assert (base[live] + chunks[live] * binning.CHUNK >= ends[live]).all()

    def test_rasterize_compact_path(self):
        # the public rasterize() wires pad_mode="none" for the packed
        # inference path; compare against the f32/padded render
        from autovfx_tpu.ops.rasterize import RasterConfig, rasterize

        g, cam = make_scene(n=300, width=64, height=48, key=1)
        ref = rasterize(
            g, cam, config=RasterConfig(dup_budget=1 << 14, backend="ref")
        )
        fast = rasterize(
            g, cam,
            config=RasterConfig(
                dup_budget=1 << 14, backend="pallas", feature_pack="bf16"
            ),
        )
        np.testing.assert_allclose(
            np.asarray(fast.alpha), np.asarray(ref.alpha), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(fast.color), np.asarray(ref.color), atol=1.5e-2
        )
