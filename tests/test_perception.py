"""Perception wrapper tests: instance merging by co-visible bbox overlap."""
import os

import numpy as np
import pytest

from autovfx_tpu.perception.wrappers import merge_instances


def _write_masks(root, instance_id, boxes):
    """boxes: {frame_idx: (x0, y0, x1, y1) or None}."""
    from PIL import Image

    d = os.path.join(root, str(instance_id))
    os.makedirs(d, exist_ok=True)
    for f, box in boxes.items():
        m = np.zeros((64, 64), np.uint8)
        if box is not None:
            x0, y0, x1, y1 = box
            m[y0:y1, x0:x1] = 255
        Image.fromarray(m).save(os.path.join(d, f"{f:05}.png"))


class TestMergeInstances:
    def test_overlapping_instances_merge(self, tmp_path):
        """Two halves of one object (bboxes overlap in every co-visible
        frame) merge into id 1+2=3 with unioned masks."""
        root = str(tmp_path)
        _write_masks(root, 1, {i: (10, 10, 30, 30) for i in range(5)})
        _write_masks(root, 2, {i: (20, 20, 40, 40) for i in range(5)})
        ids = merge_instances(root)
        assert ids == [3]
        from PIL import Image

        merged = np.asarray(
            Image.open(os.path.join(root, "3", "00000.png"))
        ) > 127
        assert merged[15, 15] and merged[35, 35]  # union of both boxes
        assert not os.path.isdir(os.path.join(root, "1"))
        assert not os.path.isdir(os.path.join(root, "2"))

    def test_disjoint_instances_survive(self, tmp_path):
        root = str(tmp_path)
        _write_masks(root, 1, {i: (2, 2, 12, 12) for i in range(4)})
        _write_masks(root, 2, {i: (40, 40, 60, 60) for i in range(4)})
        assert merge_instances(root) == [1, 2]
        assert os.path.isdir(os.path.join(root, "1"))

    def test_partial_overlap_below_threshold(self, tmp_path):
        """Overlap in only 1 of 4 co-visible frames (< 70 %): no merge."""
        root = str(tmp_path)
        _write_masks(
            root, 1,
            {0: (10, 10, 30, 30), 1: (2, 2, 8, 8), 2: (2, 2, 8, 8),
             3: (2, 2, 8, 8)},
        )
        _write_masks(root, 2, {i: (20, 20, 40, 40) for i in range(4)})
        assert merge_instances(root) == [1, 2]

    def test_chain_merge(self, tmp_path):
        """A overlaps B, (A+B) overlaps C — all collapse to one id."""
        root = str(tmp_path)
        _write_masks(root, 1, {i: (10, 10, 26, 26) for i in range(3)})
        _write_masks(root, 2, {i: (20, 20, 36, 36) for i in range(3)})
        _write_masks(root, 4, {i: (30, 30, 46, 46) for i in range(3)})
        ids = merge_instances(root)
        assert len(ids) == 1
        assert ids[0] == 7  # 1+2=3, 3+4=7


class TestMeshyWorkflow:
    def test_preview_refine_download(self, tmp_path, monkeypatch):
        """Mocked Meshy API: preview → poll → refine → poll → GLB."""
        from autovfx_tpu.retrieval import wrappers as W

        calls = []

        def fake_request(url, api_key, payload=None):
            calls.append((url, payload))
            if payload is not None and payload.get("mode") == "preview":
                return {"result": "task-p"}
            if payload is not None and payload.get("mode") == "refine":
                return {"result": "task-r"}
            # poll
            return {
                "status": "SUCCEEDED",
                "model_urls": {"glb": "https://x/model.glb"},
            }

        def fake_retrieve(url, path):
            with open(path, "wb") as f:
                f.write(b"glTF-mock")

        monkeypatch.setenv("MESHY_API_KEY", "k")
        monkeypatch.setattr(W, "_meshy_request", fake_request)
        import urllib.request

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        out = W.retrieve_asset_from_meshy(
            "red dragon", out_dir=str(tmp_path)
        )
        assert out["source"] == "meshy"
        assert out["object_path"].endswith("red_dragon.glb")
        import os

        assert os.path.exists(out["object_path"])
        modes = [p.get("mode") for _u, p in calls if p]
        assert modes == ["preview", "refine"]

    def test_offline_falls_back(self, monkeypatch):
        from autovfx_tpu.retrieval import wrappers as W

        monkeypatch.delenv("MESHY_API_KEY", raising=False)
        # no key → delegates to the local-library path (which raises
        # its own clear error when no library is configured either)
        with pytest.raises(W.AssetNotFound):
            W.retrieve_asset_from_meshy("box")


class TestClipRerank:
    def test_passthrough_without_clip(self, monkeypatch):
        """No local CLIP cache -> SBERT scores unchanged (the optional
        weights hook, wrapper_objaverse.py:183-201 analog)."""
        from autovfx_tpu.retrieval import wrappers as W

        monkeypatch.setattr(W, "_clip", lambda: None)
        sims = np.array([0.8, 0.5, 0.3], np.float32)
        out = W.clip_rerank("a red car", ["a.obj", "b.obj", "c.obj"], sims)
        np.testing.assert_array_equal(out, sims)

    def test_rerank_reorders_with_stub_model(self, monkeypatch, tmp_path):
        """With a CLIP-shaped stub, image-text scores add to SBERT and
        can flip the order."""
        from autovfx_tpu.retrieval import wrappers as W

        class StubTensor:
            def __init__(self, arr):
                self.arr = np.asarray(arr, np.float32)

            def norm(self, dim=-1, keepdim=True):
                return StubTensor(
                    np.linalg.norm(self.arr, axis=dim, keepdims=keepdim)
                )

            def __truediv__(self, o):
                return StubTensor(self.arr / o.arr)

            def __matmul__(self, o):
                return StubTensor(self.arr @ o.arr)

            @property
            def T(self):
                return StubTensor(self.arr.T)

            def mean(self):
                return float(self.arr.mean())

        class StubModel:
            def get_text_features(self, **kw):
                return StubTensor([[1.0, 0.0]])

            def get_image_features(self, **kw):
                # favor the SECOND asset (b): aligned with text
                v = [[0.0, 1.0]] if kw["which"] == 0 else [[1.0, 0.0]]
                return StubTensor(v)

        calls = {"i": 0}

        class StubProc:
            def __call__(self, text=None, images=None, **kw):
                if text is not None:
                    return {}
                k = {"which": calls["i"]}
                calls["i"] += 1
                return k

        monkeypatch.setattr(W, "_clip", lambda: (StubModel(), StubProc()))
        # stub out the preview renderer: just needs a folder with a png
        import os

        from PIL import Image

        folder = tmp_path / "previews"
        folder.mkdir()
        Image.new("RGB", (4, 4)).save(folder / "000.png")
        monkeypatch.setattr(
            "autovfx_tpu.render.preview.render_asset_previews",
            lambda p, d, oid, **kw: str(folder),
        )
        sims = np.array([0.55, 0.5], np.float32)
        out = W.clip_rerank("query", ["a.obj", "b.obj"], sims)
        # b gains +1.0 CLIP score and overtakes a
        assert out[1] > out[0]


class TestAnimatedAssetFilter:
    def test_glb_animation_check_and_filter(self, tmp_path, monkeypatch):
        from autovfx_tpu.retrieval import wrappers as W

        # reuse the committed animated walk.glb if present; else build
        # a minimal static glb
        import json as _json
        import struct

        def write_glb(path, gltf):
            data = _json.dumps(gltf).encode()
            pad = (-len(data)) % 4
            data += b" " * pad
            with open(path, "wb") as f:
                total = 12 + 8 + len(data)
                f.write(struct.pack("<III", 0x46546C67, 2, total))
                f.write(struct.pack("<II", len(data), 0x4E4F534A))
                f.write(data)

        anim = tmp_path / "dancing_robot.glb"
        static = tmp_path / "static_robot.glb"
        write_glb(anim, {"asset": {"version": "2.0"},
                         "animations": [{"channels": []}]})
        write_glb(static, {"asset": {"version": "2.0"}})
        assert W.glb_has_animation(str(anim))
        assert not W.glb_has_animation(str(static))

        monkeypatch.setenv(W.ASSET_DIR_ENV, str(tmp_path))
        # token-overlap ranking fallback (skip the SBERT model load)
        monkeypatch.setattr(W, "_sbert", lambda: None)
        out = W.retrieve_asset_from_objaverse("robot", is_animated=True)
        assert out["object_path"] == str(anim)


class TestInpaintVariants:
    """Alpha-mask panorama inpaint + SD-inpaint alternative
    (inpaint_anything.py:50-96 / stable_diffusion_inpaint.py:13-35)."""

    def test_alpha_mask_inpaint(self, tmp_path):
        from PIL import Image

        from autovfx_tpu.perception.wrappers import inpaint_img

        rgba = np.full((64, 96, 4), 255, np.uint8)
        rgba[..., 0] = 40
        rgba[..., 1] = 180
        rgba[20:36, 30:50, 3] = 0  # hole: low alpha
        p = str(tmp_path / "pano.png")
        Image.fromarray(rgba).save(p)
        out_path = inpaint_img(p, dilate_kernel_size=4)
        assert out_path.endswith("_inpaint.png")
        out = np.asarray(Image.open(out_path))
        # hole filled with surrounding color, not black
        hole = out[24:32, 36:44]
        assert abs(int(hole[..., 1].mean()) - 180) < 40
        mask = np.asarray(Image.open(p[:-4] + "_mask.png"))
        assert mask[28, 40] == 255 and mask[4, 4] == 0

    def test_sd_fill_uses_cache_then_fallback(self, tmp_path, monkeypatch):
        from PIL import Image

        from autovfx_tpu.perception.wrappers import fill_img_with_sd

        monkeypatch.delenv("AUTOVFX_ALLOW_HUB_DOWNLOAD", raising=False)
        img = np.full((32, 32, 3), 90, np.uint8)
        mask = np.zeros((32, 32), np.uint8)
        mask[8:16, 8:16] = 255
        cache = tmp_path / "sd.png"
        Image.fromarray(np.full((32, 32, 3), 7, np.uint8)).save(cache)
        out = fill_img_with_sd(img, mask, "a table", str(cache))
        assert (out == 7).all()  # precomputed result consumed verbatim
        out2 = fill_img_with_sd(img, mask, "a table", None)
        assert out2.shape == (32, 32, 3)  # LaMa/cv2 contract fallback
        assert abs(float(out2[10:14, 10:14].mean()) - 90) < 30
