"""SceneRepresentation — central mutable edit state + render orchestration.

Parity target: ``scene_representation.py:48-543``.  Same public surface:
directory layout, ``inserted_objects`` / ``fire_objects`` /
``smoke_objects`` / ``events`` lists, ``total_frames``/``fps``,
``render_scene()`` = simulate+shade → 3DGS re-render → composite, and the
same file-existence caching discipline (§5 "checkpoint/resume").

Replaced internals (TPU-first): the Blender subprocess becomes the
in-process JAX pipeline — rigid-body scan (autovfx_tpu.physics), surfel
IBL object shading (render.meshsplat), envmap-visibility shadow catcher
(render.shadow), and the jnp compositor (render.composite).  The edit
config JSON (edit_ir.EditConfig) is still written/updated for replay
parity, including ``rb_transform``.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from autovfx_tpu.core import cameras as C
from autovfx_tpu.core import ply_io
from autovfx_tpu.core.gaussians import Gaussians, merge
from autovfx_tpu.core.quaternion import rotmat_to_quat
from autovfx_tpu.edit import mesh_io
from autovfx_tpu.edit.edit_ir import EditConfig
from autovfx_tpu.ops.rasterize import RasterConfig, rasterize
from autovfx_tpu.physics import solver as PS
from autovfx_tpu.physics.world import RigidWorld, rb_transform_schema, simulate
from autovfx_tpu.render import composite as RCOMP
from autovfx_tpu.render import envmap as REnv
from autovfx_tpu.render import ibl as RIBL
from autovfx_tpu.render import meshsplat as RMS
from autovfx_tpu.render import shadow as RSH

# approach speed (m/s) above which a contact counts as a fracture-
# triggering impact; resting contacts approach at ~0, a half-metre drop
# arrives at ~3 m/s
FRACTURE_IMPACT_SPEED = 0.7


def _pace():
    """Optional gap between host dispatches of Pallas-containing
    programs: the axon TPU transport aborts on rapid same-program
    re-dispatch (PERF.md, scripts/tpu_unit_probe.py evidence).  Device-
    side scans (frames_per_dispatch) are the primary fix; this knob
    covers the remaining per-frame host loops.  Default 0 (off)."""
    import time

    pace = float(os.environ.get("AUTOVFX_DISPATCH_PACE", "0"))
    if pace > 0:
        time.sleep(pace)


@dataclass
class SceneParams:
    """The subset of opt.py:10-74 flags the pipeline consumes."""

    source_path: str = ""
    model_path: str = ""
    gaussians_ckpt_path: str = ""
    scene_mesh_path: str = ""
    custom_traj_name: Optional[str] = None
    anchor_frame_idx: int = 0
    scene_scale: float = 1.0
    downscale_factor: float = 1.0
    render_type: str = "MULTI_VIEW"
    num_frames: int = 1
    max_sh_degree: int = 4
    is_uv_mesh: bool = False
    is_indoor_scene: bool = False
    waymo_scene: bool = False
    deva_dino_threshold: float = 0.45
    edit_text: str = ""
    blender_output_dir_name: str = "blender_output"
    env_map_path: Optional[str] = None  # precomputed DiffusionLight HDR
    # alternative to env_map_path: directory of SDXL chrome-ball crops
    # named ball_ev<EV*10>.png/npy (e.g. ball_ev0.npy, ball_ev-25.npy,
    # ball_ev-50.npy); the unwrap + HDR merge then run natively
    # (render/difflight.py, ball2envmap.py + exposure2hdr.py parity)
    ball_crops_dir: Optional[str] = None
    dup_budget: int = 1 << 21
    light_samples: int = 64
    # indoor emitter mesh (opt.py:62-63) sampled into area lights
    emitter_mesh_path: Optional[str] = None
    white_background: bool = False
    cache_dir: Optional[str] = None


class SceneRepresentation:
    """Mutable scene + edit state; mirrors the reference class layout
    (dirs :55-91, state lists :79-82, frames/fps :101-105)."""

    def __init__(self, hparams: SceneParams):
        self.hparams = hparams
        self.scene_scale = hparams.scene_scale
        self.fps = 15
        self.cache_dir = hparams.cache_dir or os.path.join(
            hparams.model_path or ".", "cache"
        )
        self.traj_results_dir = os.path.join(self.cache_dir, "traj")
        self.tracking_results_dir = os.path.join(self.cache_dir, "tracking")
        self.blender_output_dir = os.path.join(
            self.cache_dir, hparams.blender_output_dir_name
        )
        for d in (
            self.cache_dir,
            self.traj_results_dir,
            self.tracking_results_dir,
            self.blender_output_dir,
        ):
            os.makedirs(d, exist_ok=True)

        # edit state (scene_representation.py:79-82)
        self.inserted_objects: List[Dict] = []
        self.fire_objects: List[str] = []
        self.smoke_objects: List[str] = []
        self.events: List[Dict] = []

        self.scene_mesh_path_for_blender = hparams.scene_mesh_path
        self.gaussians: Optional[Gaussians] = None
        self.cameras: Optional[C.Camera] = None
        self.c2w: Optional[np.ndarray] = None
        self._mesh_cache: Dict[str, mesh_io.Mesh] = {}
        self._surfel_cache: Dict[str, dict] = {}
        self._env = None
        self._env_sh = None
        self._env_ggx = None
        self._mirror_tris = None
        self._melt_sims: Dict[str, tuple] = {}
        self.rb_transform: Optional[Dict] = None

        if hparams.gaussians_ckpt_path:
            self.load_scene()
        if hparams.custom_traj_name or hparams.source_path:
            self.load_cameras()

    # ---- loading (scene_representation.py:115-221) --------------------------

    def load_scene(self):
        self.gaussians = ply_io.load_gaussians(
            self.hparams.gaussians_ckpt_path
        )

    def load_cameras(self):
        if self.hparams.custom_traj_name:
            path = os.path.join(
                self.hparams.source_path,
                "custom_camera_path",
                self.hparams.custom_traj_name + ".json",
            )
            self.cameras, self.c2w, _ = C.load_custom_trajectory(
                path, self.hparams.downscale_factor
            )

    @property
    def total_frames(self) -> int:
        if self.hparams.render_type == "MULTI_VIEW" and self.cameras is not None:
            return C.num_cameras(self.cameras)
        return self.hparams.num_frames

    @property
    def camera_position(self) -> np.ndarray:
        cam = C.index_camera(self.cameras, self.hparams.anchor_frame_idx)
        return np.asarray(cam.center)

    @property
    def camera_rotation(self) -> np.ndarray:
        """(3, 3) anchor-frame camera-to-world rotation (columns =
        OpenCV x/y/z camera axes in world; reference
        scene_representation.py:104-105)."""
        cam = C.index_camera(self.cameras, self.hparams.anchor_frame_idx)
        return np.asarray(cam.R).T  # w2c transposed = c2w

    @property
    def anchor_camera(self) -> C.Camera:
        return C.index_camera(self.cameras, self.hparams.anchor_frame_idx)

    def insert_object(self, object_info: Dict):
        assert isinstance(object_info, dict)
        self.inserted_objects.append(object_info)

    # ---- environment lighting (scene_representation.py:298-334) -------------

    def render_global_env_map(self):
        """Load (or default) the HDR envmap; cached per anchor frame.

        DiffusionLight inference is an external model; its output
        (camera-frame equirect HDR) is consumed from
        ``hparams.env_map_path`` and rotated into world frame here
        (difflight.py:35-59 contract).
        """
        if self._env is not None:
            return
        cache = os.path.join(
            self.cache_dir, f"env_{self.hparams.anchor_frame_idx:05d}.npy"
        )
        if os.path.exists(cache):
            env_world = np.load(cache)
        elif getattr(self.hparams, "ball_crops_dir", None):
            # native DiffusionLight post-processing: only the SDXL ball
            # inpaint is precomputed; unwrap + EV merge + rotation run
            # here (render/difflight.py)
            from autovfx_tpu.render import difflight as DLGT

            crops = DLGT.load_ball_crops(self.hparams.ball_crops_dir)
            env_world = DLGT.envmap_from_ball_crops(
                crops, c2w=self.anchor_camera.c2w
            )
            np.save(cache, env_world)
        elif self.hparams.env_map_path:
            env_cam = REnv.load_envmap(self.hparams.env_map_path)
            c2w = self.anchor_camera.c2w
            env_world = np.asarray(
                REnv.rotate_envmap_cam_to_world(jnp.asarray(env_cam), c2w)
            )
            np.save(cache, env_world)
        else:
            # neutral studio sky: mild gradient, brighter up
            h, w = 64, 128
            v = np.linspace(0, 1, h)[:, None, None]
            env_world = (1.2 - 0.8 * v) * np.ones((h, w, 3), np.float32)
        self._env = jnp.asarray(env_world.astype(np.float32))
        self._env_sh = jnp.asarray(RIBL.envmap_sh9(np.asarray(env_world)))
        self._env_ggx = jnp.asarray(
            RIBL.prefilter_envmap_ggx(np.asarray(env_world))
        )

    def get_sunlight_direction(self) -> np.ndarray:
        self.render_global_env_map()
        return np.asarray(REnv.sun_direction(self._env))

    # ---- meshes --------------------------------------------------------------

    def _load_mesh(self, path: str) -> mesh_io.Mesh:
        if path not in self._mesh_cache:
            self._mesh_cache[path] = mesh_io.load_mesh(path)
        return self._mesh_cache[path]

    def _mirror_scene_tris(self, max_faces: int = 30_000):
        """Scene mesh (decimated) as ray-cast targets for mirror bounces.

        Cached; per-face albedo from vertex colors (0.5 gray fallback).
        The Cycles mirror path-traces the full scene
        (all_rendering.py:1019-1062); one decimated bounce is the
        real-time analog.
        """
        if self._mirror_tris is not None:
            return self._mirror_tris
        path = self.scene_mesh_path_for_blender
        if not path or not os.path.exists(path):
            return None
        mesh = self._load_mesh(path)
        v, f = np.asarray(mesh.vertices), np.asarray(mesh.faces)
        vc = mesh.vertex_colors
        if len(f) > max_faces:
            from autovfx_tpu.sugar.decimate import decimate_quadric

            v2, f2 = decimate_quadric(
                np.asarray(v, np.float64), f, max_faces // 2
            )
            if vc is not None and len(v2):
                # nearest-original-vertex color transfer (chunked host
                # NN on a subsample — mirror-bounce albedo is low-freq)
                vc = np.asarray(vc, np.float32)
                src_v = np.asarray(v, np.float32)
                if len(src_v) > 100_000:
                    sel = np.linspace(
                        0, len(src_v) - 1, 100_000
                    ).astype(np.int64)
                    src_v, vc = src_v[sel], vc[sel]
                sq_s = (src_v * src_v).sum(-1)
                out = np.empty((len(v2), 3), np.float32)
                v2f = np.asarray(v2, np.float32)
                for s in range(0, len(v2f), 1024):
                    q = v2f[s : s + 1024]
                    d2 = (
                        (q * q).sum(-1)[:, None]
                        - 2.0 * q @ src_v.T
                        + sq_s[None, :]
                    )
                    out[s : s + 1024] = vc[np.argmin(d2, axis=1)]
                vc = out
            v, f = v2, f2
        if vc is None:
            fcol = np.full((len(f), 3), 0.5, np.float32)
        else:
            fcol = np.asarray(vc, np.float32)[f].mean(1)
        va = np.asarray(v, np.float32)
        self._mirror_tris = (
            jnp.asarray(va[f[:, 0]]),
            jnp.asarray(va[f[:, 1]]),
            jnp.asarray(va[f[:, 2]]),
            jnp.asarray(fcol),
        )
        return self._mirror_tris

    def _emitter_lights(self):
        """Cached area-light samples of the indoor emitter mesh
        (emitter_mesh_path, opt.py:62-63) or None."""
        path = getattr(self.hparams, "emitter_mesh_path", None)
        if not path or not os.path.exists(path):
            return None
        if getattr(self, "_emitter_cache", None) is None:
            from autovfx_tpu.render.emitter import load_emitter

            self._emitter_cache = load_emitter(path)
        return self._emitter_cache

    def _object_surfels(self, obj: Dict, num_samples: int = 60_000) -> dict:
        path = obj["object_path"]
        mat = obj.get("material") or {}
        mat_path = mat.get("material_path")
        key = path if not mat_path else f"{path}|{mat_path}|{mat.get('rgb')}"
        if key not in self._surfel_cache:
            anim = None
            if path.lower().endswith(".glb"):
                # animated asset playback (all_rendering.py:672-698):
                # sample surfels on the clip's own rest mesh so the
                # (tri, bary) associations match the deformed vertices
                from autovfx_tpu.edit import gltf_anim as GA

                anim = GA.load_animated_glb(path)
            if anim is not None:
                mesh = anim.rest_mesh()
            else:
                mesh = self._load_mesh(path)
            if not obj.get("from_3DGS", False):
                lo, hi = mesh.bounds
                norm_scale = 1.0 / max(float((hi - lo).max()), 1e-9)
                norm_center = (lo + hi) / 2
                mesh = mesh.normalized_to_unit_box()
            else:
                norm_scale, norm_center = 1.0, np.zeros(3)
            surf = RMS.sample_mesh_surfels(
                mesh.vertices,
                mesh.faces,
                num_samples=num_samples,
                vertex_colors=mesh.vertex_colors,
                uv=mesh.uv,
                texture=mesh.texture,
            )
            if mat_path:
                # PolyHaven maps baked onto the surfels
                # (all_rendering.py:1019-1062); an rgb alongside a
                # texture is a hue-shift recolor (:1083-1134), not a
                # multiply — handled here so render_object_pass's
                # base_color multiply must be skipped for this object
                from autovfx_tpu.render import materials as RMAT

                try:
                    material = RMAT.load_material_folder(mat_path)
                except FileNotFoundError:
                    material = None
                if material is not None:
                    surf = RMAT.apply_material_to_surfels(surf, material)
                    if mat.get("rgb") is not None:
                        surf = dict(surf)
                        surf["colors"] = RMAT.hue_shift_colors(
                            surf["colors"], mat["rgb"]
                        )
                    surf["material_baked"] = True
            if anim is not None:
                surf["anim"] = anim
                surf["anim_norm"] = (
                    float(norm_scale),
                    np.asarray(norm_center, np.float32),
                )
            self._surfel_cache[key] = surf
        return self._surfel_cache[key]

    def _animate_surfels(self, surf: dict, frame_idx: int) -> dict:
        """Replay the asset's own clip at this frame (cyclic repeat)."""
        anim = surf.get("anim")
        if anim is None:
            return surf
        from autovfx_tpu.edit import gltf_anim as GA

        t = frame_idx / float(self.fps)
        verts = anim.vertices_at(t)
        s, c = surf["anim_norm"]
        verts = (verts - c[None]) * s
        return GA.surfels_on_deformed(surf, verts, anim.faces)

    def _object_vertices_for_physics(self, obj: Dict) -> np.ndarray:
        mesh = self._load_mesh(obj["object_path"])
        if not obj.get("from_3DGS", False):
            mesh = mesh.normalized_to_unit_box()
        v = mesh.vertices
        rot = np.asarray(obj.get("rot", np.eye(3)), np.float32)
        # object-local: rotation applied at sim start via body quat
        return v

    # ---- physics (replaces render_from_blender, :259-286) --------------------

    def run_physics(self) -> Dict:
        """Simulate rigid bodies for all inserted objects; returns and
        stores the rb_transform dict (all_rendering.py:2560-2573 schema)."""
        if not self.inserted_objects:
            self.rb_transform = {}
            return self.rb_transform

        objects = []
        verts = []
        for obj in self.inserted_objects:
            o = dict(obj)
            rot = np.asarray(o.get("rot", np.eye(3)), np.float32)
            # convert rotation matrix to euler-free quaternion path:
            # world.from_objects expects 'rot' euler; pass matrix directly
            o["_rot_matrix"] = rot
            objects.append(o)
            verts.append(self._object_vertices_for_physics(obj))

        scene_mesh = None
        sv = sf = None
        if self.scene_mesh_path_for_blender and os.path.exists(
            self.scene_mesh_path_for_blender
        ):
            scene_mesh = self._load_mesh(self.scene_mesh_path_for_blender)
            sv, sf = scene_mesh.vertices, scene_mesh.faces

        cfg = PS.SolverConfig(fps=float(self.fps))
        world = RigidWorld.from_objects(
            objects, verts, scene_vertices=sv, scene_faces=sf, cfg=cfg
        )
        # override orientations with full rotation matrices when given
        quats = []
        for o in objects:
            quats.append(
                np.asarray(rotmat_to_quat(jnp.asarray(o["_rot_matrix"])))
            )
        world.state = world.state.replace(
            quat=jnp.asarray(np.stack(quats), jnp.float32)
        )
        # per-frame physics windows from the event system + kinematic
        # trajectory animations (FOLLOW_PATH analog)
        from autovfx_tpu.edit.events import physics_enabled_schedule
        from autovfx_tpu.physics.animation import kinematic_schedule

        sched = physics_enabled_schedule(
            self.inserted_objects, self.events, self.total_frames
        )
        kin = kinematic_schedule(self.inserted_objects, self.total_frames)

        # break events: segment the simulation at the earliest break frame
        # (all_rendering.py break handler + cell-fracture :1503-1634)
        break_frames = {}
        for ev in self.events:
            if ev["event_type"] == "break":
                break_frames[ev["object_id"]] = int(
                    ev.get("start_frame") or self.total_frames // 2
                ) - 1
        for o in self.inserted_objects:
            if o.get("break") and o["object_id"] not in break_frames:
                break_frames[o["object_id"]] = self.total_frames // 2

        # collision-triggered fracture (allow_fracture): probe-simulate,
        # shatter at the first real impact (the reference's per-frame BVH
        # overlap trigger, all_rendering.py:2394-2423) via the same
        # segmentation machinery as 'break'
        fracture_ids = [
            o["object_id"]
            for o in self.inserted_objects
            if o.get("fracture") and o["object_id"] not in break_frames
        ]
        if fracture_ids:
            _, _, _, impacts = simulate(
                world, self.total_frames, enabled_schedule=sched,
                kinematic=kin, return_impacts=True,
            )
            for oid in fracture_ids:
                bi = [o["object_id"] for o in objects].index(oid)
                hits = np.nonzero(
                    impacts[:, bi] > FRACTURE_IMPACT_SPEED
                )[0]
                if len(hits):
                    break_frames[oid] = int(hits[0]) + 1

        self._fragments = {}
        if not break_frames:
            final, pos, quat = simulate(
                world, self.total_frames, enabled_schedule=sched,
                kinematic=kin,
            )
            self.rb_transform = rb_transform_schema(world, pos, quat)
            self._world_segments = [(world, (pos, quat), 0)]
            return self.rb_transform

        f_break = max(min(break_frames.values()), 1)
        final1, pos1, quat1 = simulate(
            world, f_break, enabled_schedule=sched[:f_break], kinematic=kin
        )
        rb1 = rb_transform_schema(world, pos1, quat1)

        # shatter the breaking objects; build the segment-2 world
        from autovfx_tpu.core.quaternion import quat_to_rotmat
        from autovfx_tpu.physics.fracture import (
            burst_velocities,
            fracture_mesh,
        )

        objects2, verts2, linvels2 = [], [], []
        keep_map = []  # segment-2 body index -> (kind, ref)
        st = final1
        for i, o in enumerate(objects):
            oid = o["object_id"]
            if oid not in break_frames:
                objects2.append(o)
                verts2.append(verts[i])
                linvels2.append(np.asarray(st.linvel[i]))
                keep_map.append(("body", i))
                continue
            mesh = self._load_mesh(o["object_path"])
            if not o.get("from_3DGS", False):
                mesh = mesh.normalized_to_unit_box()
            pieces = fracture_mesh(mesh.vertices, mesh.faces, num_pieces=8)
            rot_i = np.asarray(quat_to_rotmat(st.quat[i]))
            com_i = np.asarray(st.pos[i])
            scale_i = float(o.get("scale", 1.0))
            vels = burst_velocities(
                pieces,
                np.asarray(st.linvel[i]),
                np.asarray(st.angvel[i]),
                np.zeros(3),
            )
            origin_i = com_i - rot_i @ (
                world.com_offsets[i]
            )
            rb_parent = o.get("rigid_body") or {}
            for pi, (pv, pf) in enumerate(
                zip(pieces.vertices, pieces.faces)
            ):
                frag_id = f"{oid}_frag{pi}"
                frag_obj = {
                    "object_id": frag_id,
                    "object_name": frag_id,
                    "pos": origin_i,
                    "rot": rot_i,
                    "scale": scale_i,
                    "rigid_body": {
                        "rb_type": "ACTIVE",
                        "mass": float(
                            rb_parent.get("mass", 1.0)
                            * pieces.mass_fractions[pi]
                        ),
                        "restitution": float(
                            rb_parent.get("restitution", 0.5)
                        ),
                    },
                }
                objects2.append(frag_obj)
                verts2.append(pv)
                linvels2.append(vels[pi])
                keep_map.append(("frag", (oid, pi)))
                self._fragments.setdefault(oid, []).append(
                    {
                        "object": frag_obj,
                        "vertices": pv,
                        "faces": pf,
                        "visible_from": f_break,
                        "material": o.get("material"),
                    }
                )

        world2 = RigidWorld.from_objects(
            objects2, verts2, scene_vertices=sv, scene_faces=sf, cfg=cfg
        )
        # carry over segment-1 end state for surviving bodies
        pos2 = np.asarray(world2.state.pos).copy()
        quat2 = np.asarray(world2.state.quat).copy()
        lin2 = np.zeros_like(pos2)
        ang2 = np.zeros_like(pos2)
        for j, (kind, ref) in enumerate(keep_map):
            lin2[j] = linvels2[j]
            if kind == "body":
                i = ref
                pos2[j] = np.asarray(st.pos[i])
                quat2[j] = np.asarray(st.quat[i])
                ang2[j] = np.asarray(st.angvel[i])
        world2.state = world2.state.replace(
            pos=jnp.asarray(pos2),
            quat=jnp.asarray(quat2),
            linvel=jnp.asarray(lin2),
            angvel=jnp.asarray(ang2),
        )
        n2 = self.total_frames - f_break
        sched2 = np.ones((n2, len(objects2)), bool)
        for j, (kind, ref) in enumerate(keep_map):
            if kind == "body":
                sched2[:, j] = sched[f_break:, ref]
        final2, posb, quatb = simulate(
            world2, n2, enabled_schedule=sched2
        )
        rb2 = rb_transform_schema(world2, posb, quatb)

        # merge: surviving bodies get both segments; fragments appear
        # from f_break (earlier frames hold the parent's entry)
        rb = rb1
        for j, (kind, ref) in enumerate(keep_map):
            name = world2.names[j]
            seg2 = rb2[name]
            merged = rb.get(name, {})
            for t in range(n2):
                merged[str(f_break + t)] = seg2[str(t)]
            rb[name] = merged
        self.rb_transform = rb
        # per-frame hull poses for shadows: frames before f_break use the
        # segment-1 world (breaking parent included, its real pre-break
        # trajectory pos1/quat1); fragments only cast from f_break on
        self._world_segments = [
            (world, (pos1, quat1), 0),
            (world2, (posb, quatb), f_break),
        ]
        return self.rb_transform

    # ---- rendering -----------------------------------------------------------

    def _raster_cfg(self) -> RasterConfig:
        backend = "pallas" if jax.default_backend() == "tpu" else "ref"
        return RasterConfig(
            dup_budget=self.hparams.dup_budget, backend=backend
        )

    def render_from_3DGS(
        self,
        frame_indices: Optional[List[int]] = None,
        post_rendering: bool = False,
        save_dir: Optional[str] = None,
        frames_per_dispatch: Optional[int] = None,
    ):
        """Render background (and optionally merged 3DGS objects moved by
        rb_transform, scene_representation.py:357-371) for each frame.

        Returns (colors (F,H,W,3), depths (F,H,W), alphas (F,H,W)).

        ``frames_per_dispatch`` > 1 batches that many frames into ONE
        device dispatch (a ``lax.scan``), the same discipline
        ``render_clip`` uses — rapid host re-dispatch of the same
        Pallas-containing executable can abort on some TPU transports
        (see PERF.md, axon cadence bug), and one dispatch per N frames
        is also simply faster.  Defaults to AUTOVFX_FRAMES_PER_DISPATCH
        (8).  The merged-object path (post-physics 3DGS objects) stays
        per-frame — its splat merge is host-side — and is paced via
        AUTOVFX_DISPATCH_PACE seconds between dispatches (default 0).
        """
        cfg = self._raster_cfg()
        frames = frame_indices or list(range(self.total_frames))
        colors, depths, alphas = [], [], []
        # white_background flag parity (scene_representation.py:93)
        bg = (
            jnp.ones((3,), jnp.float32)
            if self.hparams.white_background
            else jnp.zeros((3,), jnp.float32)
        )

        def _save(fi, color, depth):
            if not save_dir:
                return
            os.makedirs(save_dir, exist_ok=True)
            from PIL import Image

            Image.fromarray(
                (np.clip(color, 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(save_dir, f"{fi:05d}.png"))
            np.save(os.path.join(save_dir, f"depth_{fi:05d}.npy"), depth)

        needs_merge = bool(
            post_rendering
            and self.rb_transform
            and any(o.get("from_3DGS") for o in self.inserted_objects)
        )
        if frames_per_dispatch is None:
            frames_per_dispatch = int(
                os.environ.get("AUTOVFX_FRAMES_PER_DISPATCH", "8")
            )

        if frames_per_dispatch > 1 and not needs_merge:
            # device-side scan: one dispatch per N frames
            cams = self.cameras
            n = frames_per_dispatch

            @jax.jit
            def render_chunk(g, idxs):
                def step(_, i):
                    out = rasterize(
                        g, C.index_camera(cams, i), bg=bg, config=cfg
                    )
                    return None, (out.color, out.depth, out.alpha)

                _, outs = jax.lax.scan(step, None, idxs)
                return outs

            for s in range(0, len(frames), n):
                chunk = frames[s : s + n]
                # pad to a fixed length so every dispatch reuses the
                # same compiled program
                idxs = np.asarray(
                    chunk + [chunk[-1]] * (n - len(chunk)), np.int32
                )
                c, d, a = render_chunk(self.gaussians, jnp.asarray(idxs))
                c, d, a = np.asarray(c), np.asarray(d), np.asarray(a)
                for j, fi in enumerate(chunk):
                    colors.append(c[j])
                    depths.append(d[j])
                    alphas.append(a[j])
                    _save(fi, c[j], d[j])
                _pace()
            return np.stack(colors), np.stack(depths), np.stack(alphas)

        render_one = jax.jit(
            lambda g, cam: rasterize(g, cam, bg=bg, config=cfg)
        )
        for fi in frames:
            cam = C.index_camera(self.cameras, fi)
            g = self.gaussians
            if post_rendering and self.rb_transform:
                g = self._merge_object_gaussians(g, fi)
            out = render_one(g, cam)
            colors.append(np.asarray(out.color))
            depths.append(np.asarray(out.depth))
            alphas.append(np.asarray(out.alpha))
            _save(fi, colors[-1], depths[-1])
            _pace()
        return np.stack(colors), np.stack(depths), np.stack(alphas)

    def _effect_progress(self, obj: Dict, frame_idx: int):
        """(melt_p, burn_p) for this object at this frame, from flags +
        event windows (shared by surfel and from_3DGS paths)."""
        from autovfx_tpu.render import melt as RMELT

        oid = obj["object_id"]
        melt_p = burn_p = 0.0
        for ev in self.events:
            if ev["object_id"] != oid:
                continue
            prog = RMELT.effect_progress(
                frame_idx, int(ev.get("start_frame") or 1),
                ev.get("end_frame"), self.total_frames,
            )
            if ev["event_type"] == "melting":
                melt_p = max(melt_p, prog)
            elif ev["event_type"] == "incinerate":
                burn_p = max(burn_p, prog)
        if obj.get("melting") and melt_p == 0.0 and not any(
            ev["object_id"] == oid and ev["event_type"] == "melting"
            for ev in self.events
        ):
            melt_p = RMELT.effect_progress(
                frame_idx, 1, None, self.total_frames
            )
        return melt_p, burn_p

    def _fire_burn_progress(self, obj: Dict, frame_idx: int) -> float:
        """Burn-to-black factor: the reference keyframes the burning
        object's base color to (0.1, 0.1, 0.1) linearly over the fire
        window (all_rendering.py:1352-1388)."""
        from autovfx_tpu.render import melt as RMELT

        oid = obj["object_id"]
        p = 0.0
        for ev in self.events:
            if ev["object_id"] == oid and ev["event_type"] == "fire":
                p = max(
                    p,
                    RMELT.effect_progress(
                        frame_idx, int(ev.get("start_frame") or 1),
                        ev.get("end_frame"), self.total_frames,
                    ),
                )
        if p == 0.0 and oid in self.fire_objects and not any(
            ev["object_id"] == oid and ev["event_type"] == "fire"
            for ev in self.events
        ):
            p = RMELT.effect_progress(frame_idx, 1, None, self.total_frames)
        return p

    def _static_transform(self, obj: Dict):
        """(scale, R (3,3) np, t (3,) np) of the object's rest pose
        (rb_transform frame 0 if simulated, else the placement fields).
        Melting objects are solved in world space from this pose."""
        tr = (
            self.rb_transform.get(obj["object_id"], {}).get("0")
            if self.rb_transform
            else None
        )
        if tr is not None:
            from autovfx_tpu.core.quaternion import euler_to_rotmat

            rot = np.asarray(
                euler_to_rotmat(*[jnp.float32(x) for x in tr["rot"]])
            )
            return float(tr["scale"][0]), rot, np.asarray(tr["pos"], np.float32)
        return (
            float(obj.get("scale", 1.0)),
            np.asarray(obj.get("rot", np.eye(3)), np.float32),
            np.asarray(obj.get("pos", np.zeros(3)), np.float32),
        )

    def _melt_liquid(self, obj: Dict, points: np.ndarray,
                     normals: np.ndarray):
        """Whole-clip thin-film liquid solve for a melting object
        (cached per object).  ``points``/``normals`` are WORLD-space
        samples (posed surfels or splat centers).  The scene mesh (when
        present) becomes the solver bed so melt flows around geometry —
        the Mantaflow LIQUID domain + effector analog
        (all_rendering.py:1649-1817); per-frame tracers/meshes replace
        the reference's melted-mesh exports (:2575-2585)."""
        from autovfx_tpu.render import liquid as LQ

        oid = obj["object_id"]
        if oid in self._melt_sims:
            return self._melt_sims[oid]
        prog = np.array(
            [
                self._effect_progress(obj, f)[0]
                for f in range(self.total_frames)
            ],
            np.float32,
        )
        cfg = LQ.LiquidConfig()
        sim = LQ.MeltSim(points, normals, cfg=cfg)
        path = self.scene_mesh_path_for_blender
        if path and os.path.exists(path):
            mesh = self._load_mesh(path)
            bed = LQ.bed_from_mesh(
                np.asarray(mesh.vertices), np.asarray(mesh.faces),
                np.asarray(sim.origin), sim.extent, cfg.resolution,
                ground_z=sim.ground_z,
            )
            sim = LQ.MeltSim(
                points, normals, ground_z=sim.ground_z, bed=bed, cfg=cfg
            )
        frames = sim.run(prog)
        self._melt_sims[oid] = (sim, frames)
        return sim, frames

    def _merge_object_gaussians(self, g: Gaussians, frame_idx: int):
        """Merge 3DGS-extracted objects transformed by the per-frame
        rigid-body pose (scene_representation.py:357-371); melting /
        incinerate events deform the splats directly
        (reference :372-421 matches Gaussians to per-frame melt meshes —
        see render/melt.py:melt_gaussians for the TPU-native field)."""
        from autovfx_tpu.render import melt as RMELT

        merged = g
        for obj in self.inserted_objects:
            if not obj.get("from_3DGS"):
                continue
            gp = obj.get("gaussians_path")
            if not gp or not os.path.exists(gp):
                continue
            og = ply_io.load_gaussians(gp)
            melt_p, burn_p = self._effect_progress(obj, frame_idx)
            # melting objects stay at their rest pose — the liquid solve
            # owns all motion after melt onset
            tr = self.rb_transform.get(obj["object_id"], {}).get(
                "0" if melt_p > 0.0 else str(frame_idx)
            )
            if tr is not None:
                from autovfx_tpu.core.quaternion import (
                    euler_to_rotmat,
                    rotmat_to_quat as r2q,
                )

                rot = euler_to_rotmat(*[jnp.float32(x) for x in tr["rot"]])
                q = r2q(rot)
                og = og.transformed(
                    scale=float(tr["scale"][0]),
                    rotation_quat=q,
                    translation=jnp.asarray(tr["pos"], jnp.float32),
                    pivot=jnp.zeros(3),
                )
            if melt_p > 0.0:
                from autovfx_tpu.render import liquid as LQ

                oid = obj["object_id"]
                idx = getattr(self, "_melt_idx", {}).get(oid)
                if idx is None:
                    # solve once from the rest-pose splat centers; the
                    # active-index map is cached so later frames skip
                    # the per-frame host materialization
                    idx = np.nonzero(np.asarray(og.active))[0]
                    if not hasattr(self, "_melt_idx"):
                        self._melt_idx = {}
                    self._melt_idx[oid] = idx
                    sim, mf = self._melt_liquid(
                        obj, np.asarray(og.xyz)[idx], None
                    )
                else:
                    sim, mf = self._melt_sims[oid]
                f = min(frame_idx, mf.tracer_pos.shape[0] - 1)
                og = LQ.apply_melt_to_gaussians(og, idx, mf, f, sim.cell)
            if burn_p > 0.0:
                og = RMELT.incinerate_gaussians(og, burn_p)
            merged = merge(merged, og)
        return merged

    def _fragment_surfels(self, oid: str, pi: int, frag: Dict) -> dict:
        key = f"__frag__{oid}_{pi}"
        if key not in self._surfel_cache:
            self._surfel_cache[key] = RMS.sample_mesh_surfels(
                frag["vertices"], frag["faces"], num_samples=6_000
            )
        return self._surfel_cache[key]

    def _draw_list(self, frame_idx: int):
        """Objects (and debris fragments) visible at this frame."""
        frags = getattr(self, "_fragments", {}) or {}
        out = []
        for obj in self.inserted_objects:
            if obj.get("from_3DGS"):
                continue
            oid = obj["object_id"]
            if oid in frags and frame_idx >= frags[oid][0]["visible_from"]:
                continue  # parent replaced by debris
            out.append((obj, self._object_surfels(obj)))
        for oid, pieces in frags.items():
            for pi, frag in enumerate(pieces):
                if frame_idx >= frag["visible_from"]:
                    out.append(
                        (frag["object"], self._fragment_surfels(oid, pi, frag))
                    )
        return out

    def render_object_pass(self, frame_idx: int):
        """Inserted (non-3DGS) objects as IBL-shaded surfels -> RGBA+depth."""
        self.render_global_env_map()
        cam = C.index_camera(self.cameras, frame_idx)
        cfg = self._raster_cfg()
        gs = []
        from autovfx_tpu.edit.events import compile_event_schedule
        from autovfx_tpu.render import melt as RMELT

        obj_ids = [o["object_id"] for o, _ in self._draw_list(frame_idx)]
        for obj, surf in self._draw_list(frame_idx):
            surf = self._animate_surfels(surf, frame_idx)
            melt_p, burn_p = self._effect_progress(obj, frame_idx)
            liquid_pose = False
            if melt_p > 0.0:
                # liquid melt: surfels become tracers of the thin-film
                # solve (world space; the solve owns the pose)
                s0, R0, t0 = self._static_transform(obj)
                base_pts = np.asarray(surf["points"], np.float32)
                w_pts = (s0 * base_pts) @ R0.T + t0
                w_nrm = np.asarray(surf["normals"], np.float32) @ R0.T
                sim, mf = self._melt_liquid(obj, w_pts, w_nrm)
                f = min(frame_idx, mf.tracer_pos.shape[0] - 1)
                surf = dict(surf)
                surf["points"] = np.asarray(mf.tracer_pos[f])
                surf["normals"] = np.asarray(mf.tracer_norm[f])
                # spreading tracers thin out: grow radii to keep cover
                surf["radius"] = np.float32(
                    surf["radius"] * float(s0) * (1.0 + 0.6 * melt_p)
                )
                liquid_pose = True
            if burn_p > 0.0:
                cols, op_scale = RMELT.incinerate_colors(
                    surf["colors"], burn_p
                )
                surf = dict(surf)
                surf["colors"] = cols
                if op_scale <= 0.0:
                    continue  # fully burned away
            fire_p = self._fire_burn_progress(obj, frame_idx)
            if fire_p > 0.0:
                # burn-to-black keyframe mix (all_rendering.py:1352+)
                surf = dict(surf)
                surf["colors"] = (
                    np.asarray(surf["colors"], np.float32) * (1.0 - fire_p)
                    + 0.1 * fire_p
                )
            tr = (
                self.rb_transform.get(obj["object_id"], {}).get(
                    str(frame_idx)
                )
                if self.rb_transform and not liquid_pose
                else None
            )
            if tr is not None:
                from autovfx_tpu.core.quaternion import euler_to_rotmat

                rot = np.asarray(
                    euler_to_rotmat(*[jnp.float32(x) for x in tr["rot"]])
                )
                transform = (
                    float(tr["scale"][0]),
                    jnp.asarray(rot),
                    jnp.asarray(tr["pos"], jnp.float32),
                )
            elif liquid_pose:
                # tracers are already world-space
                transform = (
                    1.0,
                    jnp.asarray(np.eye(3), jnp.float32),
                    jnp.zeros(3, jnp.float32),
                )
            else:
                transform = (
                    float(obj.get("scale", 1.0)),
                    jnp.asarray(obj.get("rot", np.eye(3)), jnp.float32),
                    jnp.asarray(obj.get("pos", np.zeros(3)), jnp.float32),
                )
            mat = obj.get("material") or {}
            base = mat.get("rgb")
            # texture-baked surfels already consumed rgb as a hue shift
            if surf.get("material_baked"):
                base = None
            mirror_scene = (
                self._mirror_scene_tris() if mat.get("is_mirror") else None
            )
            gs.append(
                RMS.shaded_object_gaussians(
                    surf,
                    self._env,
                    self._env_sh,
                    cam.center,
                    base_color=None if base is None else jnp.asarray(base),
                    roughness=float(
                        mat.get("roughness", 0.5)
                        if not mat.get("is_mirror")
                        else 0.0
                    ),
                    metallic=float(
                        mat.get("metallic", 0.0)
                        if not mat.get("is_mirror")
                        else 1.0
                    ),
                    transform=transform,
                    env_ggx=self._env_ggx,
                    mirror_scene=mirror_scene,
                    emitter=self._emitter_lights(),
                )
            )
        if not gs:
            cam0 = cam
            h, w = cam0.height, cam0.width
            return (
                np.zeros((h, w, 3), np.float32),
                np.zeros((h, w), np.float32),
                np.full((h, w), 1e9, np.float32),
            )
        g_all = gs[0]
        for extra in gs[1:]:
            g_all = merge(g_all, extra)
        out = rasterize(g_all, cam, config=self._raster_cfg())
        color = np.asarray(out.color)
        alpha = np.asarray(out.alpha)
        depth_n = np.asarray(out.depth) / np.maximum(alpha, 1e-6)
        depth_n = np.where(alpha > 0.01, depth_n, 1e9)
        return color, alpha, depth_n

    def _smoke_trajectory(self):
        """Simulate smoke/fire for the clip (cached); returns per-frame
        (density, temperature) stacks + domain (origin, extent) or None.

        Replaces the Mantaflow quick_smoke domain placed above each
        burning/smoking object (all_rendering.py:1227-1457); fire/smoke
        events gate the fuel inflow per frame.
        """
        if getattr(self, "_smoke_traj", None) is not None:
            return self._smoke_traj
        ids = set(self.fire_objects) | set(self.smoke_objects)
        for ev in self.events:
            if ev["event_type"] in ("fire", "smoke"):
                ids.add(ev["object_id"])
        emitters = [
            o for o in self.inserted_objects if o["object_id"] in ids
        ]
        if not emitters:
            self._smoke_traj = None
            return None
        import jax.numpy as jnp

        from autovfx_tpu.edit.events import compile_event_schedule
        from autovfx_tpu.render import smoke as SM

        centers = np.stack(
            [np.asarray(o["pos"], np.float32) for o in emitters]
        )
        extent = max(
            2.5 * float(np.ptp(centers, axis=0).max() + 1.0), 2.0
        )
        origin = centers.mean(0) - extent * np.array([0.5, 0.5, 0.15])
        cfg = SM.SmokeConfig(
            resolution=48,
            dt=1.0 / self.fps,
            with_fire=bool(self.fire_objects),
            dissolve_speed=30,  # reference all_rendering.py:1277
        )
        mask = jnp.zeros((cfg.resolution,) * 3)
        for o in emitters:
            cell = (np.asarray(o["pos"]) - origin) / extent * cfg.resolution
            mask = jnp.maximum(
                mask,
                SM.sphere_inflow(cfg, cell, 0.06 * cfg.resolution),
            )
        # per-frame fuel from events (default: always on)
        sched = compile_event_schedule(
            self.events,
            [o["object_id"] for o in emitters],
            self.total_frames,
        )
        fire_smoke = sched["fire"] | sched["smoke"]
        has_event = fire_smoke.any(axis=0)
        on = np.ones((self.total_frames,), bool)
        if has_event.any():
            on = fire_smoke[:, has_event].any(axis=1)
        # adaptive: the fixed-res domain recenters to follow the plume
        # (Blender adaptive-domain analog, all_rendering.py:1271-1275)
        traj, origins = SM.simulate_smoke(
            cfg, mask, self.total_frames, jnp.asarray(on), adaptive=True
        )
        self._smoke_traj = (
            traj, origin.astype(np.float32), extent, cfg,
            np.asarray(origins),
        )
        return self._smoke_traj

    def render_smoke_pass(self, frame_idx: int):
        """Smoke RGBA+depth (+fire premultiplied) for one frame, rendered
        through the splat rasterizer (the rgb_smoke_fire pass analog)."""
        traj = self._smoke_trajectory()
        cam = C.index_camera(self.cameras, frame_idx)
        h, w = cam.height, cam.width
        if traj is None:
            return None
        states, origin, extent, cfg, origin_cells = traj
        from autovfx_tpu.render import smoke as SM

        cell = extent / cfg.resolution
        origin_f = origin + origin_cells[frame_idx].astype(np.float32) * cell
        g_smoke = SM.smoke_to_gaussians(
            SM.apply_density_noise(
                states.density[frame_idx], frame_idx, cfg
            ),
            states.temperature[frame_idx],
            origin_f,
            extent,
            with_fire=cfg.with_fire,
        )
        out = rasterize(g_smoke, cam, config=self._raster_cfg())
        color = np.asarray(out.color)
        alpha = np.asarray(out.alpha)
        depth = np.asarray(out.depth) / np.maximum(alpha, 1e-6)
        depth = np.where(alpha > 0.01, depth, 1e9)
        # the rasterizer's color IS the premultiplied foreground
        # radiance (Σ T·α·c over black bg) — the compositor's
        # C_pre + bg·(1−α) contract (blend_all.py:300-302) wants it
        # as-is, not multiplied by alpha again.  Supplied for smoke-only
        # domains too (the reference renders the _pre pass whenever a
        # smoke/fire domain exists), so gray smoke keeps its color
        # instead of darkening with the empty object pass.
        fire_premult = color
        return color, alpha, depth, fire_premult

    def render_shadow_pass(self, frame_idx: int, bg_depth, bg_alpha):
        """Envmap-visibility shadow ratio for the background pixels."""
        self.render_global_env_map()
        if not self.inserted_objects or self.rb_transform is None:
            return np.ones_like(bg_depth)
        cam = C.index_camera(self.cameras, frame_idx)
        dirs, contrib = REnv.importance_directions(
            np.asarray(self._env), self.hparams.light_samples,
            up=np.array([0.0, 0.0, 1.0]), stratified=True, dedup=True,
        )
        weights = contrib.sum(-1)
        # hull planes at this frame's pose (segment-aware: break edits
        # switch worlds at the break frame)
        segs = getattr(self, "_world_segments", None)
        if not segs:
            return np.ones_like(bg_depth)
        world, (pos, quat), start = segs[0]
        for w_s, traj_s, s_s in segs[1:]:
            if frame_idx >= s_s:
                world, (pos, quat), start = w_s, traj_s, s_s
        local = min(frame_idx - start, len(pos) - 1)
        state_f = world.state.replace(
            pos=jnp.asarray(pos[local]), quat=jnp.asarray(quat[local])
        )
        planes, masks = RSH.object_hulls_world(world.shape, state_f)
        # melting objects: the physics hull stays full-size, but the
        # material has collapsed into the liquid state — re-fit the hull
        # to this frame's tracers (solid remnant + puddle), the
        # per-frame-melted-mesh shadow analog (all_rendering.py:2575+)
        melt_rows = []
        for obj in self.inserted_objects:
            m_p, _ = self._effect_progress(obj, frame_idx)
            cached = self._melt_sims.get(obj["object_id"])
            if m_p <= 0.0 or cached is None:
                continue
            oid = obj["object_id"]
            if oid not in world.names:
                continue
            _, mf = cached
            f = min(frame_idx, mf.tracer_pos.shape[0] - 1)
            pts_t = np.asarray(mf.tracer_pos[f])
            lo = pts_t.min(0) - 1e-3
            hi = pts_t.max(0) + 1e-3
            box = np.array(
                [
                    [1, 0, 0, hi[0]], [-1, 0, 0, -lo[0]],
                    [0, 1, 0, hi[1]], [0, -1, 0, -lo[1]],
                    [0, 0, 1, hi[2]], [0, 0, -1, -lo[2]],
                ],
                np.float32,
            )
            melt_rows.append((world.names.index(oid), box))
        if melt_rows:
            planes = np.array(planes)
            masks = np.array(masks)
            for b, box in melt_rows:
                planes[b] = 0.0
                masks[b] = False
                planes[b, :6] = box
                masks[b, :6] = True
            planes = jnp.asarray(planes)
            masks = jnp.asarray(masks)
        ratio = RSH.shadow_ratio_map(
            cam,
            jnp.asarray(bg_depth),
            jnp.asarray(np.maximum(bg_alpha, 1e-3)),
            jnp.asarray(dirs),
            jnp.asarray(weights),
            planes,
            masks,
        )
        return np.asarray(ratio)

    def render_scene(
        self,
        skip_render_3DGS: bool = False,
        save: bool = True,
        frames_per_dispatch: Optional[int] = None,
    ):
        """Full edit render (scene_representation.py:224-232 semantics):
        physics → per-frame background + object + shadow passes →
        composite.  Returns (F, H, W, 3) frames.

        ``frames_per_dispatch`` batches the background pass into
        device-side scans and paces the remaining per-frame dispatches
        (see render_from_3DGS; AUTOVFX_DISPATCH_PACE)."""
        self.run_physics()
        self.render_global_env_map()

        bg_c, bg_d, bg_a = self.render_from_3DGS(
            post_rendering=not skip_render_3DGS,
            frames_per_dispatch=frames_per_dispatch,
        )
        frames = []
        for fi in range(self.total_frames):
            _pace()
            obj_c, obj_a, obj_d = self.render_object_pass(fi)
            scene_d = bg_d[fi] / np.maximum(bg_a[fi], 1e-6)
            scene_d = np.where(bg_a[fi] > 0.01, scene_d, 1e9)
            ratio = self.render_shadow_pass(fi, bg_d[fi], bg_a[fi])
            smoke = self.render_smoke_pass(fi)
            smoke_kw = {}
            if smoke is not None:
                s_c, s_a, s_d, fire_pre = smoke
                smoke_kw = dict(
                    smoke_color=jnp.asarray(s_c),
                    smoke_alpha=jnp.asarray(s_a),
                    smoke_depth=jnp.asarray(s_d),
                    fire_premult=(
                        jnp.asarray(fire_pre) if fire_pre is not None else None
                    ),
                )
            inp = RCOMP.CompositeInputs(
                bg_color=jnp.asarray(bg_c[fi]),
                scene_depth=jnp.asarray(scene_d),
                obj_color=jnp.asarray(obj_c),
                obj_alpha=jnp.asarray(obj_a),
                obj_depth=jnp.asarray(obj_d),
                shadow_ratio=jnp.asarray(ratio),
                catcher_alpha=jnp.asarray(np.clip(bg_a[fi], 0, 1)),
                **smoke_kw,
            )
            frames.append(np.asarray(RCOMP.composite_frame(inp)))
        frames = np.stack(frames)
        if save:
            out_dir = os.path.join(self.blender_output_dir, "blended")
            os.makedirs(out_dir, exist_ok=True)
            from PIL import Image

            for i, fr in enumerate(frames):
                Image.fromarray(
                    (np.clip(fr, 0, 1) * 255).astype(np.uint8)
                ).save(os.path.join(out_dir, f"{i:04d}.png"))
            self.write_edit_config()
        return frames

    # ---- edit IR --------------------------------------------------------------

    def write_edit_config(self, path: Optional[str] = None) -> str:
        cam0 = C.index_camera(self.cameras, 0)
        cfg = EditConfig(
            edit_text=self.hparams.edit_text,
            blender_cache_dir=self.blender_output_dir,
            im_width=self.cameras.width,
            im_height=self.cameras.height,
            K=np.asarray(cam0.K).tolist(),
            c2w=(
                self.c2w.tolist() if self.c2w is not None else []
            ),
            scene_mesh_path=self.scene_mesh_path_for_blender,
            is_uv_mesh=self.hparams.is_uv_mesh,
            output_dir_name=self.hparams.blender_output_dir_name,
            render_type=self.hparams.render_type,
            num_frames=self.total_frames,
            anchor_frame_idx=self.hparams.anchor_frame_idx,
            is_indoor_scene=self.hparams.is_indoor_scene,
            waymo_scene=self.hparams.waymo_scene,
            global_env_map_path=self.hparams.env_map_path or "",
            insert_object_info=self.inserted_objects,
            fire_objects=self.fire_objects,
            smoke_objects=self.smoke_objects,
            events=self.events,
            rb_transform=self.rb_transform,
            scene_scale=self.scene_scale,
            fps=self.fps,
        )
        path = path or os.path.join(self.cache_dir, "edit_config.json")
        cfg.to_json(path)
        return path
