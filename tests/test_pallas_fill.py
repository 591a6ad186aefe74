"""Monotone-fill Pallas kernel vs the XLA scatter reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autovfx_tpu.ops import binning as B
from autovfx_tpu.ops.fill_pallas import C_STEP, EXCLUDED, monotone_fill


def _ref(values, starts, k):
    return np.asarray(
        B.segment_fill_int(jnp.asarray(values), jnp.asarray(starts), k)
    )


class TestMonotoneFill:
    def _check(self, starts, values, k):
        n_live = int((starts < int(EXCLUDED)).sum())
        out = monotone_fill(
            jnp.asarray(starts),
            [jnp.asarray(v) for v in values],
            k,
            interpret=True,
        )
        for i, v in enumerate(values):
            ref = _ref(v[:n_live], starts[:n_live], k)
            np.testing.assert_array_equal(
                np.asarray(out[i]), ref, err_msg=f"stream {i}"
            )

    def test_sparse_random(self):
        rng = np.random.RandomState(0)
        k = C_STEP * 2
        pos = np.sort(
            rng.choice(k, size=300, replace=False)
        ).astype(np.int32)
        pos[0] = 0
        starts = np.concatenate(
            [pos, np.full(40, int(EXCLUDED), np.int32)]
        )
        values = [
            rng.randint(0, 1 << 24, size=len(starts)).astype(np.int32)
            for _ in range(3)
        ]
        self._check(starts, values, k)

    def test_dense_every_slot(self):
        rng = np.random.RandomState(1)
        k = C_STEP
        starts = np.arange(k, dtype=np.int32)
        values = [
            rng.randint(0, 1 << 24, size=k).astype(np.int32)
            for _ in range(2)
        ]
        self._check(starts, values, k)

    def test_first_start_nonzero(self):
        # slots before the first start must read 0
        k = C_STEP
        starts = np.array([100, 500, 1900], np.int32)
        values = [np.array([7, 9, 11], np.int32)]
        out = monotone_fill(
            jnp.asarray(starts), [jnp.asarray(values[0])], k,
            interpret=True,
        )
        got = np.asarray(out[0])
        assert (got[:100] == 0).all()
        assert (got[100:500] == 7).all()
        assert (got[500:1900] == 9).all()
        assert (got[1900:] == 11).all()

    def test_rejects_bad_k(self):
        with pytest.raises(ValueError):
            monotone_fill(
                jnp.zeros((4,), jnp.int32), [jnp.zeros((4,), jnp.int32)],
                C_STEP + 1,
            )


class TestBinningPallasFill:
    def test_matches_xla_backend(self):
        from autovfx_tpu.ops.projection import preprocess
        from autovfx_tpu.utils.synthetic import make_scene

        g, cam = make_scene(n=3000, width=128, height=96)
        splats = jax.jit(preprocess)(g, cam)
        k = C_STEP * 8
        a = B.bin_splats(splats, 128, 96, k, fill_backend="xla")
        b = B.bin_splats(
            splats, 128, 96, k, fill_backend="pallas_interpret"
        )
        np.testing.assert_array_equal(np.asarray(a.gid), np.asarray(b.gid))
        np.testing.assert_array_equal(
            np.asarray(a.tile), np.asarray(b.tile)
        )
        np.testing.assert_array_equal(
            np.asarray(a.tile_start), np.asarray(b.tile_start)
        )
        np.testing.assert_array_equal(
            np.asarray(a.tile_count), np.asarray(b.tile_count)
        )
