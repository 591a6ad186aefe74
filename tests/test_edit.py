"""Edit-layer tests: mesh IO, edit IR, DSL, and the full language-driven
edit pipeline (offline program) on a synthetic scene — BASELINE configs
4 (rigid-body drop edit) and 5 (language-driven edit) in miniature."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autovfx_tpu.core import cameras as C
from autovfx_tpu.core import ply_io
from autovfx_tpu.edit import mesh_io
from autovfx_tpu.edit.edit_ir import EditConfig, default_object_info
from autovfx_tpu.utils.synthetic import make_gaussians


def box_mesh(half=0.5, color=(0.8, 0.2, 0.2)):
    v = np.array(
        [
            [x, y, z]
            for x in (-half, half)
            for y in (-half, half)
            for z in (-half, half)
        ],
        np.float32,
    )
    f = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ],
        np.int64,
    )
    c = np.tile(np.asarray(color, np.float32), (len(v), 1))
    return mesh_io.Mesh(vertices=v, faces=f, vertex_colors=c)


def ground_mesh(size=10.0):
    v = np.array(
        [[-size, -size, 0], [size, -size, 0], [size, size, 0],
         [-size, size, 0]],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return mesh_io.Mesh(vertices=v, faces=f)


class TestMeshIO:
    def test_obj_roundtrip(self, tmp_path):
        m = box_mesh()
        p = str(tmp_path / "box.obj")
        mesh_io.save_obj(p, m)
        m2 = mesh_io.load_obj(p)
        np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
        assert len(m2.faces) == len(m.faces)

    def test_ply_mesh_roundtrip(self, tmp_path):
        m = box_mesh()
        p = str(tmp_path / "box.ply")
        mesh_io.save_ply_mesh(p, m)
        m2 = mesh_io.load_ply_mesh(p)
        np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
        np.testing.assert_allclose(
            m2.vertex_colors, m.vertex_colors, atol=0.01
        )
        np.testing.assert_array_equal(m2.faces, m.faces)

    def test_glb_load(self, tmp_path):
        # hand-build a minimal GLB with one triangle
        import struct

        pos = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
        )
        idx = np.array([0, 1, 2], np.uint16)
        bin_data = pos.tobytes() + idx.tobytes() + b"\x00\x00"
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [
                {
                    "primitives": [
                        {"attributes": {"POSITION": 0}, "indices": 1}
                    ]
                }
            ],
            "accessors": [
                {
                    "bufferView": 0,
                    "componentType": 5126,
                    "count": 3,
                    "type": "VEC3",
                },
                {
                    "bufferView": 1,
                    "componentType": 5123,
                    "count": 3,
                    "type": "SCALAR",
                },
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 6},
            ],
            "buffers": [{"byteLength": len(bin_data)}],
        }
        js = json.dumps(gltf).encode()
        js += b" " * ((4 - len(js) % 4) % 4)
        total = 12 + 8 + len(js) + 8 + len(bin_data)
        p = str(tmp_path / "tri.glb")
        with open(p, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A))
            f.write(js)
            f.write(struct.pack("<II", len(bin_data), 0x004E4942))
            f.write(bin_data)
        m = mesh_io.load_glb(p)
        assert m.vertices.shape == (3, 3)
        assert m.faces.shape == (1, 3)
        # y-up -> z-up conversion: (0,1,0) becomes (0,0,1)
        np.testing.assert_allclose(
            sorted(m.vertices[:, 2].tolist()), [0, 0, 1], atol=1e-6
        )

    def test_bottom_center(self):
        m = box_mesh()
        np.testing.assert_allclose(m.bottom_center(), [0, 0, -0.5], atol=1e-6)


class TestEditIR:
    def test_roundtrip(self, tmp_path):
        obj = default_object_info()
        obj["pos"] = np.array([1.0, 2.0, 3.0], np.float32)
        cfg = EditConfig(
            edit_text="drop a ball",
            insert_object_info=[obj],
            rb_transform={"a": {"0": {"pos": [0, 0, 1],
                                      "rot": [0, 0, 0],
                                      "scale": [1, 1, 1]}}},
        )
        p = str(tmp_path / "cfg.json")
        cfg.to_json(p)
        cfg2 = EditConfig.from_json(p)
        assert cfg2.edit_text == "drop a ball"
        assert cfg2.insert_object_info[0]["pos"] == [1.0, 2.0, 3.0]
        assert cfg2.rb_transform["a"]["0"]["pos"] == [0, 0, 1]


@pytest.fixture
def scene(tmp_path):
    from autovfx_tpu.edit.scene_representation import (
        SceneParams,
        SceneRepresentation,
    )

    root = str(tmp_path)
    # synthetic splat scene: flat-ish cloud above a ground plane
    g = make_gaussians(400, jax.random.PRNGKey(0), spread=1.5,
                       scale_range=(0.02, 0.08))
    g = g.replace(xyz=g.xyz.at[:, 2].multiply(0.1))
    ckpt = os.path.join(root, "scene.ply")
    ply_io.save_ply(ckpt, g)
    gm = ground_mesh()
    mesh_path = os.path.join(root, "scene_mesh.obj")
    mesh_io.save_obj(mesh_path, gm)
    # trajectory: 4 cameras orbiting
    cams = C.stack_cameras(
        [
            C.look_at_camera(
                [3 * np.cos(a), 3 * np.sin(a), 1.6],
                [0, 0, 0],
                [0, 0, 1],
                fx=50.0,
                fy=50.0,
                width=64,
                height=48,
            )
            for a in np.linspace(0, np.pi / 2, 4)
        ]
    )
    traj_dir = os.path.join(root, "custom_camera_path")
    C.save_custom_trajectory(os.path.join(traj_dir, "test_traj.json"), cams)
    params = SceneParams(
        source_path=root,
        model_path=root,
        gaussians_ckpt_path=ckpt,
        scene_mesh_path=mesh_path,
        custom_traj_name="test_traj",
        cache_dir=os.path.join(root, "cache"),
        dup_budget=1 << 14,
        light_samples=8,
    )
    return SceneRepresentation(params)


class TestSceneRepresentation:
    def test_loads(self, scene):
        assert scene.gaussians.capacity == 400
        assert scene.total_frames == 4

    def test_render_from_3dgs(self, scene):
        colors, depths, alphas = scene.render_from_3DGS(frame_indices=[0])
        assert colors.shape == (1, 48, 64, 3)
        assert np.isfinite(colors).all()
        assert alphas.max() > 0.3

    def test_drop_edit_end_to_end(self, scene, tmp_path):
        """BASELINE config 4: rigid-body drop edit with contact solve +
        shadow composite per frame."""
        from autovfx_tpu.edit import edit_utils as EU

        ball_path = os.path.join(str(tmp_path), "ball.obj")
        mesh_io.save_obj(ball_path, box_mesh(0.5, color=(0.9, 0.1, 0.1)))

        obj = default_object_info()
        obj["object_name"] = "red box"
        obj["object_id"] = "redbox01"
        obj["object_path"] = ball_path
        obj["pos"] = np.array([0.0, 0.0, 1.2], np.float32)
        obj["scale"] = 0.3
        obj = EU.allow_physics(obj)
        EU.insert_object(scene, obj)

        frames = scene.render_scene()
        assert frames.shape == (4, 48, 64, 3)
        assert np.isfinite(frames).all()
        # rb_transform written with per-frame poses, object falls
        rb = scene.rb_transform["redbox01"]
        z0 = rb["0"]["pos"][2]
        z3 = rb["3"]["pos"][2]
        assert z3 < z0
        # edit config IR written
        cfg_path = os.path.join(scene.cache_dir, "edit_config.json")
        assert os.path.exists(cfg_path)
        cfg = EditConfig.from_json(cfg_path)
        assert cfg.rb_transform is not None

    def test_lmp_offline_program(self, scene, tmp_path):
        """BASELINE config 5 analog: program synthesis (offline) drives
        the DSL through exec_safe."""
        from autovfx_tpu.gpt.lmp import setup_LMP

        ball_path = os.path.join(str(tmp_path), "ball.obj")
        mesh_io.save_obj(ball_path, box_mesh(0.5))
        program = f"""
obj = make_default_object()
obj = translate_object(obj, np.array([0.0, 0.0, 1.0]))
obj = allow_physics(obj)
insert_object(scene, obj)
"""
        lmps = setup_LMP(scene, offline_program=lambda q: program)
        # add a helper the program uses (tests extra var injection)
        def make_default_object():
            o = default_object_info()
            o["object_path"] = ball_path
            o["object_id"] = "prog01"
            o["scale"] = 0.3
            o["pos"] = np.array([0.0, 0.0, 0.0], np.float32)
            return o

        lmps["lmp"].variable_vars["make_default_object"] = make_default_object
        lmps["lmp"]("drop a box")
        assert len(scene.inserted_objects) == 1
        assert scene.inserted_objects[0]["rigid_body"]["rb_type"] == "ACTIVE"

    def test_exec_safe_blocks_import(self, scene):
        from autovfx_tpu.gpt.lmp import exec_safe

        with pytest.raises(ValueError):
            exec_safe("import os", {}, {})
        with pytest.raises(ValueError):
            exec_safe("x = ().__class__", {}, {})


class TestExtraction:
    def test_extract_object_from_scene(self, tmp_path):
        """detect->extract chain with precomputed (synthetic) DEVA masks:
        the mask-ray triangle voting splits the scene mesh + gaussians
        into object/remainder (extract_object.py:55-392 analog)."""
        from PIL import Image

        from autovfx_tpu.core.gaussians import merge
        from autovfx_tpu.edit.scene_representation import (
            SceneParams,
            SceneRepresentation,
        )
        from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
        from autovfx_tpu.perception.extract import extract_object_from_scene
        from autovfx_tpu.utils.synthetic import make_gaussians

        root = str(tmp_path)
        # scene mesh: ground plane + box object sitting at origin
        ground = ground_mesh(6.0)
        box = box_mesh(0.5)
        box = box._replace(vertices=box.vertices + np.array([0, 0, 0.5],
                                                            np.float32))
        scene_m = mesh_io.Mesh(
            vertices=np.concatenate([ground.vertices, box.vertices]),
            faces=np.concatenate([ground.faces,
                                  box.faces + len(ground.vertices)]),
        )
        mesh_path = os.path.join(root, "scene_mesh.obj")
        mesh_io.save_obj(mesh_path, scene_m)

        # gaussians: flat ground cloud + a cluster inside the box
        g_ground = make_gaussians(300, jax.random.PRNGKey(0), spread=2.0)
        g_ground = g_ground.replace(
            xyz=g_ground.xyz.at[:, 2].set(
                jnp.abs(g_ground.xyz[:, 2]) * 0.01
            )
        )
        g_obj = make_gaussians(150, jax.random.PRNGKey(1), spread=0.22)
        g_obj = g_obj.replace(xyz=g_obj.xyz + jnp.array([0, 0, 0.5]))
        g = merge(g_ground, g_obj)
        from autovfx_tpu.core import ply_io

        ply_io.save_ply(os.path.join(root, "scene.ply"), g)

        cams = C.stack_cameras(
            [
                C.look_at_camera(
                    [2.5 * np.cos(a), 2.5 * np.sin(a), 1.6],
                    [0, 0, 0.4],
                    [0, 0, 1],
                    fx=60.0,
                    fy=60.0,
                    width=64,
                    height=48,
                )
                for a in np.linspace(0, np.pi, 3)
            ]
        )
        os.makedirs(os.path.join(root, "custom_camera_path"))
        C.save_custom_trajectory(
            os.path.join(root, "custom_camera_path/t.json"), cams
        )
        scene = SceneRepresentation(
            SceneParams(
                source_path=root,
                model_path=root,
                gaussians_ckpt_path=os.path.join(root, "scene.ply"),
                scene_mesh_path=mesh_path,
                custom_traj_name="t",
                cache_dir=os.path.join(root, "cache"),
                dup_budget=1 << 14,
            )
        )
        # synthetic DEVA masks: render ONLY the object gaussians' alpha
        cfg = RasterConfig(dup_budget=1 << 14, backend="ref")
        g_obj_only = g.replace(
            active=jnp.arange(g.capacity) >= 300
        )
        tdir = os.path.join(scene.tracking_results_dir, "box", "1")
        os.makedirs(tdir)
        for i in range(3):
            out = rasterize(g_obj_only, C.index_camera(cams, i), config=cfg)
            mask = (np.asarray(out.alpha) > 0.4) * 255
            Image.fromarray(mask.astype(np.uint8)).save(
                os.path.join(tdir, f"{i:05d}.png")
            )

        path = extract_object_from_scene(scene, "box", 1)
        assert os.path.exists(path)
        obj_mesh = mesh_io.load_mesh(path)
        # extracted mesh is the box region: bounded, above ground
        assert len(obj_mesh.vertices) >= 4
        assert obj_mesh.vertices[:, 2].max() > 0.5
        assert np.abs(obj_mesh.vertices[:, :2]).max() < 1.5
        # gaussian split exported, object side mostly the cluster
        base = os.path.dirname(os.path.dirname(path))
        from autovfx_tpu.core.ply_io import load_ply

        g_sel = load_ply(os.path.join(base, "object_gaussians.ply"))
        sel_xyz = np.asarray(g_sel.xyz)
        frac_cluster = (np.linalg.norm(
            sel_xyz - [0, 0, 0.5], axis=1) < 0.8).mean()
        assert frac_cluster > 0.7


class TestEditSceneCLI:
    @pytest.mark.slow
    def test_cli_offline_program(self, scene, tmp_path):
        """edit_scene.py end-to-end through the real CLI surface
        (argparse → SceneParams → LMP preamble → render_scene)."""
        import subprocess
        import sys

        root = scene.hparams.source_path
        ball_path = os.path.join(str(tmp_path), "ball.obj")
        mesh_io.save_obj(ball_path, box_mesh(0.5, color=(0.2, 0.2, 0.9)))
        prog = tmp_path / "prog.py"
        prog.write_text(
            "obj = get_default_object_info()\n"
            f"obj['object_path'] = {ball_path!r}\n"
            "obj['object_name'] = 'blue box'\n"
            "obj['object_id'] = 'bluebox1'\n"
            "obj['pos'] = [0.0, 0.0, 0.8]\n"
            "obj['scale'] = 0.3\n"
            "insert_object(scene, obj)\n"
        )
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [
                sys.executable,
                os.path.join(repo, "edit_scene.py"),
                "--source_path", root,
                "--model_path", root,
                "--gaussians_ckpt_path",
                scene.hparams.gaussians_ckpt_path,
                "--scene_mesh_path", scene.hparams.scene_mesh_path,
                "--custom_traj_name", "test_traj",
                "--dup_budget", str(1 << 14),
                "--edit_text", "Put a blue box in the scene.",
                "--offline_program", str(prog),
            ],
            cwd=str(tmp_path),
            capture_output=True,
            text=True,
            timeout=1200,
            env={**os.environ, "AUTOVFX_FORCE_CPU": "1"},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        # the LMP preamble's render_scene writes the edit-config IR
        cache = os.path.join(root, "cache")
        cfgs = [
            os.path.join(dp, f)
            for dp, _dn, fn in os.walk(root)
            for f in fn
            if f == "edit_config.json"
        ]
        assert cfgs, f"no edit_config.json under {root} (cache {cache})"


class TestDrivingHelpers:
    def test_directions_follow_camera(self, scene):
        from autovfx_tpu.edit import edit_utils as EU

        front = EU.get_direction(scene, "front")
        left = EU.get_direction(scene, "left")
        right = EU.get_direction(scene, "right")
        up = EU.get_direction(scene, "up")
        np.testing.assert_allclose(up, [0, 0, 1])
        np.testing.assert_allclose(left, -right, atol=1e-6)
        # front is horizontal (no z) and orthogonal to the camera x axis
        assert abs(front[2]) < 1e-6
        assert abs(np.dot(front, right)) < 1e-6
        # anchor camera looks toward the origin from (3, 0, 1.6):
        # horizontal forward points in -x
        assert front[0] < -0.5
        with pytest.raises(ValueError):
            EU.get_direction(scene, "sideways")

    def test_vehicle_position_on_ground(self, scene):
        from autovfx_tpu.edit import edit_utils as EU

        p = EU.get_vehicle_position(scene)
        assert p[2] == 0.0
        np.testing.assert_allclose(
            p[:2], scene.camera_position[:2], atol=1e-6
        )


class TestWaymoPrompt:
    def test_every_example_parses_and_uses_known_helpers(self):
        """Each few-shot block in the Waymo planner prompt must be valid
        Python and call only documented DSL helpers (reference coverage:
        planner_prompt_waymo.txt)."""
        import ast
        import os
        import re

        from autovfx_tpu.edit import edit_utils as EU

        path = os.path.join(
            os.path.dirname(EU.__file__), "..", "gpt", "prompts",
            "planner_prompt_waymo.txt",
        )
        text = open(path).read()
        blocks = re.split(r"# Query:.*\n", text)[1:]
        assert len(blocks) >= 12  # reference-scale few-shot coverage
        allowed = set(dir(EU)) | {
            "np", "range", "len", "float", "int", "scene", "print",
        }
        for b in blocks:
            tree = ast.parse(b)
            for node in ast.walk(tree):
                if isinstance(node, ast.Call) and isinstance(
                    node.func, ast.Name
                ):
                    assert node.func.id in allowed, node.func.id


class TestKitchenSink:
    """Cross-feature integration: mirror material + melting object +
    burning object + indoor emitter + white background in ONE scene —
    catches interactions the per-feature tests can't."""

    @pytest.mark.slow
    def test_everything_at_once_renders_finite(self, tmp_path):
        from autovfx_tpu.core import cameras as C, ply_io
        from autovfx_tpu.edit import edit_utils as EU, mesh_io
        from autovfx_tpu.edit.scene_representation import (
            SceneParams,
            SceneRepresentation,
        )
        from autovfx_tpu.utils.synthetic import make_gaussians

        root = str(tmp_path)
        g = make_gaussians(120, jax.random.PRNGKey(0), spread=1.5)
        g = g.replace(xyz=g.xyz.at[:, 2].multiply(0.1))
        ply_io.save_ply(os.path.join(root, "scene.ply"), g)
        mesh_io.save_obj(os.path.join(root, "scene_mesh.obj"), ground_mesh())
        # emitter panel above the scene
        from autovfx_tpu.edit.mesh_io import Mesh

        ev = np.array(
            [[-0.3, -0.3, 1.2], [0.3, -0.3, 1.2], [0.3, 0.3, 1.2],
             [-0.3, 0.3, 1.2]], np.float32
        )
        ef = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        emitter_path = os.path.join(root, "emitter.obj")
        mesh_io.save_obj(emitter_path, Mesh(ev, ef))
        cams = C.stack_cameras(
            [
                C.look_at_camera(
                    [3, 0.2 * i, 1.6], [0, 0, 0], [0, 0, 1],
                    fx=40.0, fy=40.0, width=48, height=36,
                )
                for i in range(6)
            ]
        )
        os.makedirs(os.path.join(root, "custom_camera_path"), exist_ok=True)
        C.save_custom_trajectory(
            os.path.join(root, "custom_camera_path/t.json"), cams
        )
        box = os.path.join(root, "box.obj")
        mesh_io.save_obj(box, box_mesh(0.5, color=(0.8, 0.8, 0.8)))
        scene = SceneRepresentation(
            SceneParams(
                source_path=root, model_path=root,
                gaussians_ckpt_path=os.path.join(root, "scene.ply"),
                scene_mesh_path=os.path.join(root, "scene_mesh.obj"),
                custom_traj_name="t",
                cache_dir=os.path.join(root, "cache"),
                dup_budget=1 << 15,
                light_samples=4,
                num_frames=6,
                is_indoor_scene=True,
                emitter_mesh_path=emitter_path,
                white_background=True,
            )
        )
        from autovfx_tpu.edit.edit_ir import default_object_info

        def make(oid, pos):
            o = default_object_info()
            o["object_id"] = oid
            o["object_name"] = oid
            o["object_path"] = box
            o["pos"] = np.array(pos, np.float32)
            o["scale"] = 0.35
            return o

        mirror = make("mirror", [0, -0.6, 0.2])
        mat = EU.init_material()
        mat.is_mirror = True
        mirror = EU.apply_material(mirror, mat)
        EU.insert_object(scene, mirror)

        melty = make("melty", [0, 0.6, 0.2])
        melty = EU.make_melting(melty)
        EU.insert_object(scene, melty)
        EU.add_event(scene, melty, "melting", start_frame=1)

        burny = make("burny", [0.6, 0, 0.2])
        burny = EU.add_fire(scene, burny)
        EU.insert_object(scene, burny)

        frames = scene.render_scene(save=False)
        assert frames.shape == (6, 36, 48, 3)
        assert np.isfinite(frames).all()
        # white background shows through uncovered pixels
        assert frames.max() > 0.9
        # the clip animates (melt + fire + smoke evolve)
        assert np.abs(frames[-1] - frames[0]).max() > 0.05
