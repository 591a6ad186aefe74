"""Unit tests for autovfx_tpu.core (quaternions, SH, gaussians, cameras, IO)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autovfx_tpu.core import quaternion as Q
from autovfx_tpu.core import sh as SH
from autovfx_tpu.core import cameras as C
from autovfx_tpu.core import ply_io
from autovfx_tpu.core.gaussians import Gaussians, merge


def rand_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return Q.quat_normalize(q)


class TestQuaternion:
    def test_rotmat_roundtrip(self):
        q = rand_quats(jax.random.PRNGKey(0), 64)
        m = Q.quat_to_rotmat(q)
        # R^T R = I, det = 1
        eye = jnp.swapaxes(m, -1, -2) @ m
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(m)), 1.0, atol=1e-5)
        q2 = Q.rotmat_to_quat(m)
        # quaternion double cover: q ~ -q
        sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(np.asarray(q2 * sign), np.asarray(q), atol=1e-4)

    def test_multiply_compose(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        qa, qb = rand_quats(k1, 8), rand_quats(k2, 8)
        m = Q.quat_to_rotmat(Q.quat_multiply(qa, qb))
        m2 = Q.quat_to_rotmat(qa) @ Q.quat_to_rotmat(qb)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)

    def test_rotate_matches_matrix(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        q = rand_quats(k1, 8)
        v = jax.random.normal(k2, (8, 3))
        r1 = Q.quat_rotate(q, v)
        r2 = jnp.einsum("nij,nj->ni", Q.quat_to_rotmat(q), v)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    def test_axis_angle(self):
        axis = jnp.array([[0.0, 0.0, 1.0]])
        q = Q.quat_from_axis_angle(axis, jnp.array([np.pi / 2]))
        v = Q.quat_rotate(q, jnp.array([[1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(v[0]), [0.0, 1.0, 0.0], atol=1e-6)


class TestSH:
    def test_dc_only(self):
        sh = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
        out = SH.eval_sh(3, sh, dirs)
        np.testing.assert_allclose(np.asarray(out), SH.C0, atol=1e-6)

    def test_rgb_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        sh = SH.rgb_to_sh(rgb)
        coeffs = jnp.zeros((1, 16, 3)).at[:, 0, :].set(sh)
        out = SH.sh_to_rgb(3, coeffs, jnp.array([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-6)

    def test_band1_directionality(self):
        # f(z) coefficient (index 2) scales +C1*z
        sh = jnp.zeros((1, 16, 3)).at[:, 2, :].set(1.0)
        up = SH.eval_sh(1, sh, jnp.array([[0.0, 0.0, 1.0]]))
        down = SH.eval_sh(1, sh, jnp.array([[0.0, 0.0, -1.0]]))
        np.testing.assert_allclose(np.asarray(up), SH.C1, atol=1e-6)
        np.testing.assert_allclose(np.asarray(down), -SH.C1, atol=1e-6)


class TestGaussians:
    def make(self, n=16, key=0):
        k = jax.random.PRNGKey(key)
        xyz = jax.random.normal(k, (n, 3))
        return Gaussians.create(xyz, sh_degree=2)

    def test_create_shapes(self):
        g = self.make(10)
        assert g.capacity == 10
        assert g.sh_degree == 2
        assert g.sh_rest.shape == (10, 8, 3)
        np.testing.assert_allclose(np.asarray(g.opacity), 0.1, atol=1e-6)

    def test_pad_inactive_transparent(self):
        g = self.make(4).pad_to(8)
        assert g.capacity == 8
        op = np.asarray(g.opacity)
        assert (op[4:] == 0).all()
        assert int(g.num_active) == 4

    def test_transform_roundtrip(self):
        g = self.make(32)
        q = Q.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.array(0.7))
        t = jnp.array([1.0, -2.0, 0.5])
        g2 = g.transformed(scale=2.0, rotation_quat=q, translation=t)
        g3 = g2.transformed(
            scale=0.5,
            rotation_quat=Q.quat_conjugate(q),
            translation=-t,
        )
        # scale->rotate->translate is not its own inverse in this order;
        # instead verify distances scale correctly and com moves by t.
        w = np.asarray(g.active, np.float32)[:, None]
        com = (np.asarray(g.xyz) * w).sum(0) / w.sum()
        com2 = (np.asarray(g2.xyz) * w).sum(0) / w.sum()
        np.testing.assert_allclose(com2, com + np.asarray(t), atol=1e-5)
        d1 = np.linalg.norm(np.asarray(g.xyz) - com, axis=1)
        d2 = np.linalg.norm(np.asarray(g2.xyz) - com2, axis=1)
        np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g2.scales), 2.0 * np.asarray(g.scales), rtol=1e-5
        )
        del g3

    def test_merge(self):
        a, b = self.make(4, 0), self.make(6, 1)
        m = merge(a, b)
        assert m.capacity == 10
        np.testing.assert_allclose(np.asarray(m.xyz[:4]), np.asarray(a.xyz))

    def test_normals_unit_and_min_axis(self):
        g = self.make(8)
        g = g.replace(
            log_scales=jnp.log(
                jnp.tile(jnp.array([[1.0, 1.0, 0.01]]), (8, 1))
            )
        )
        n = g.normals()
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(n), axis=1), 1.0, atol=1e-5
        )
        # identity quats -> min axis is z
        np.testing.assert_allclose(np.abs(np.asarray(n)[:, 2]), 1.0, atol=1e-5)


class TestCamera:
    def make(self):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.0, 0.0, -5.0]
        return C.camera_from_c2w(c2w, 100.0, 100.0, 32.0, 24.0, 64, 48)

    def test_center(self):
        cam = self.make()
        np.testing.assert_allclose(
            np.asarray(cam.center), [0.0, 0.0, -5.0], atol=1e-6
        )

    def test_project_center_point(self):
        cam = self.make()
        uv, z = cam.project(jnp.array([[0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(z), [5.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(uv[0]), [32.0, 24.0], atol=1e-5)

    def test_project_offset(self):
        cam = self.make()
        uv, z = cam.project(jnp.array([[1.0, 2.0, 0.0]]))
        np.testing.assert_allclose(
            np.asarray(uv[0]), [32.0 + 100.0 / 5.0, 24.0 + 2 * 100.0 / 5.0],
            atol=1e-4,
        )

    def test_ray_directions_through_center(self):
        cam = self.make()
        dirs = cam.ray_directions()
        # center-ish pixel points along +z (OpenCV forward)
        d = np.asarray(dirs[24, 32])
        d = d / np.linalg.norm(d)
        assert d[2] > 0.99

    def test_lookat_projects_target_to_center(self):
        cam = C.look_at_camera(
            eye=[3.0, 2.0, 1.0],
            target=[0.0, 0.0, 0.0],
            up=[0.0, 0.0, 1.0],
            fx=120.0,
            fy=120.0,
            width=100,
            height=80,
        )
        uv, z = cam.project(jnp.array([[0.0, 0.0, 0.0]]))
        assert float(z[0]) > 0
        np.testing.assert_allclose(np.asarray(uv[0]), [50.0, 40.0], atol=1e-3)

    def test_traj_json_roundtrip(self, tmp_path):
        cams = C.stack_cameras([self.make(), self.make()])
        p = str(tmp_path / "traj.json")
        C.save_custom_trajectory(p, cams)
        loaded, c2w, names = C.load_custom_trajectory(p)
        assert C.num_cameras(loaded) == 2
        np.testing.assert_allclose(
            np.asarray(loaded.R), np.asarray(cams.R), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(loaded.t), np.asarray(cams.t), atol=1e-5
        )


class TestPlyIO:
    def make(self, n=20):
        k = jax.random.PRNGKey(5)
        ks = jax.random.split(k, 6)
        return Gaussians(
            xyz=jax.random.normal(ks[0], (n, 3)),
            sh_dc=jax.random.normal(ks[1], (n, 3)),
            sh_rest=jax.random.normal(ks[2], (n, 15, 3)),
            log_scales=jax.random.normal(ks[3], (n, 3)),
            quats=Q.quat_normalize(jax.random.normal(ks[4], (n, 4))),
            opacity_logit=jax.random.normal(ks[5], (n,)),
            active=jnp.ones((n,), bool),
        )

    def test_ply_roundtrip(self, tmp_path):
        g = self.make()
        p = str(tmp_path / "g.ply")
        ply_io.save_ply(p, g)
        g2 = ply_io.load_ply(p)
        for field in ("xyz", "sh_dc", "sh_rest", "log_scales", "quats",
                      "opacity_logit"):
            np.testing.assert_allclose(
                np.asarray(getattr(g2, field)),
                np.asarray(getattr(g, field)),
                atol=1e-6,
                err_msg=field,
            )

    def test_ply_reads_reference_layout(self, tmp_path):
        # Hand-build a PLY with the reference property ordering and verify
        # the channel-major f_rest unpacking.
        n, k_rest = 3, 15
        g = self.make(n)
        p = str(tmp_path / "ref.ply")
        ply_io.save_ply(p, g)
        with open(p, "rb") as f:
            raw = f.read()
        header = raw[: raw.index(b"end_header")].decode()
        assert "property float f_rest_44" in header
        assert header.index("f_dc_2") < header.index("f_rest_0")
        assert header.index("opacity") < header.index("scale_0")

    def test_npz_roundtrip(self, tmp_path):
        g = self.make()
        p = str(tmp_path / "g.npz")
        ply_io.save_npz(p, g)
        g2 = ply_io.load_npz(p)
        np.testing.assert_allclose(np.asarray(g2.xyz), np.asarray(g.xyz))

    def test_sugar_pt(self, tmp_path):
        torch = pytest.importorskip("torch")
        n = 7
        sd = {
            "_points": torch.randn(n, 3),
            "all_densities": torch.randn(n, 1),
            "_sh_coordinates_dc": torch.randn(n, 1, 3),
            "_sh_coordinates_rest": torch.randn(n, 24, 3),
            "_scales": torch.randn(n, 3),
            "_quaternions": torch.randn(n, 4),
        }
        p = str(tmp_path / "sugar.pt")
        torch.save({"state_dict": sd}, p)
        g = ply_io.load_sugar_pt(p)
        assert g.capacity == n
        assert g.sh_rest.shape == (n, 24, 3)
        assert g.sh_degree == 4
        np.testing.assert_allclose(
            np.asarray(g.xyz), sd["_points"].numpy(), atol=1e-6
        )
