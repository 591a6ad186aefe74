"""Objaverse precomputed embedding index: format, exact search,
download-client fallbacks, and wrapper integration.

Parity target: retrieval/wrapper_objaverse.py:20-59 (SBERT db + SCaNN),
:82-91 (glb download), :141-223 (search → re-rank → pick).  Exact top-k
over the npz database is the SCaNN-equivalent at this scale.
"""
import json
import os

import numpy as np
import pytest

from autovfx_tpu.retrieval import objaverse_index as OI
from autovfx_tpu.retrieval import wrappers as W


ENTRIES = {
    "uid-basketball": {"name": "orange basketball", "tags": ["ball", "sport"]},
    "uid-chair": {"name": "wooden chair", "tags": ["furniture"]},
    "uid-dragon": {"name": "flying dragon", "animated": True,
                   "gobj_index": "0/12345"},
    "uid-table": {"name": "dining table", "tags": ["furniture", "wood"]},
    "uid-ball2": {"name": "soccer ball", "tags": ["ball"]},
}


@pytest.fixture()
def index_path(tmp_path, monkeypatch):
    # force the deterministic hash embedder (no SBERT cache in CI)
    monkeypatch.setattr(OI, "_sbert_embed", lambda texts: None)
    path = str(tmp_path / "objaverse_index.npz")
    OI.build_index(ENTRIES, out_path=path, embedder="hash")
    return path


class TestIndexFormat:
    def test_roundtrip(self, index_path):
        idx = OI.ObjaverseIndex.load(index_path)
        assert idx.database.shape == (5, OI.HASH_DIM)
        assert idx.database.dtype == np.float32
        # rows are unit-norm
        np.testing.assert_allclose(
            np.linalg.norm(idx.database, axis=1), 1.0, atol=1e-5
        )
        assert sorted(idx.uids) == sorted(ENTRIES)
        assert idx.embedder.startswith("hash")
        assert idx.animated is not None and idx.animated.sum() == 1
        assert idx.gobj_paths(["uid-dragon"]) == {"uid-dragon": "0/12345"}

    def test_version_check(self, index_path, tmp_path, monkeypatch):
        # corrupt the version and confirm load refuses
        with np.load(index_path, allow_pickle=False) as z:
            arrays = {k: z[k] for k in z.files}
        arrays["meta"] = np.asarray(json.dumps({"version": 99, "embedder": "hash:256"}))
        bad = str(tmp_path / "bad.npz")
        np.savez_compressed(bad, **arrays)
        with pytest.raises(ValueError, match="version"):
            OI.ObjaverseIndex.load(bad)

    def test_no_pickle_needed(self, index_path):
        # the format promise: loads with allow_pickle=False
        with np.load(index_path, allow_pickle=False) as z:
            assert "database" in z.files and "uids" in z.files


class TestExactSearch:
    def test_topk_matches_brute_force(self, index_path, monkeypatch):
        monkeypatch.setattr(OI, "_sbert_embed", lambda texts: None)
        idx = OI.ObjaverseIndex.load(index_path)
        q, _ = OI.embed_texts(["basketball ball"], embedder="hash")
        sims = idx.database @ q[0]
        want = [str(idx.uids[i]) for i in np.argsort(-sims)
                if sims[i] >= 0.0][:10]
        got, dists = idx.search("basketball ball", top_k=10,
                                cosine_threshold=0.0)
        assert got == want
        assert dists == sorted(dists, reverse=True)

    def test_threshold_filters(self, index_path, monkeypatch):
        monkeypatch.setattr(OI, "_sbert_embed", lambda texts: None)
        idx = OI.ObjaverseIndex.load(index_path)
        got, dists = idx.search("basketball", cosine_threshold=0.3)
        assert "uid-basketball" in got
        assert all(d >= 0.3 for d in dists)
        # an unrelated query yields nothing above threshold
        got, _ = idx.search("zyqwvux", cosine_threshold=0.3)
        assert got == []

    def test_animated_mask(self, index_path, monkeypatch):
        monkeypatch.setattr(OI, "_sbert_embed", lambda texts: None)
        idx = OI.ObjaverseIndex.load(index_path)
        got, _ = idx.search("dragon", animated_only=True,
                            cosine_threshold=0.1)
        assert got == ["uid-dragon"]
        # the mask replaces the reference's separate animated db
        got, _ = idx.search("chair", animated_only=True,
                            cosine_threshold=0.1)
        assert got == []

    def test_embedder_mismatch_raises(self, index_path, monkeypatch):
        idx = OI.ObjaverseIndex.load(index_path)
        # pretend the index was built with SBERT but only hash is live
        monkeypatch.setattr(OI, "_sbert_embed", lambda texts: None)
        idx.embedder = "sbert:all-mpnet-base-v2"
        with pytest.raises(RuntimeError, match="SBERT|embedder"):
            idx.search("chair")


class TestDownloadClient:
    def test_existing_files_resolve(self, tmp_path):
        save = tmp_path / "assets"
        save.mkdir()
        (save / "uid-chair.glb").write_bytes(b"glb")
        out = OI.download_objects(["uid-chair", "uid-missing"], str(save))
        assert out == {"uid-chair": str(save / "uid-chair.glb")}

    def test_mirror_resolves(self, tmp_path, monkeypatch):
        mirror = tmp_path / "mirror" / "sub"
        mirror.mkdir(parents=True)
        (mirror / "uid-table.glb").write_bytes(b"glb")
        monkeypatch.setenv(OI.MIRROR_ENV, str(tmp_path / "mirror"))
        out = OI.download_objects(["uid-table"], str(tmp_path / "dl"))
        assert out["uid-table"].endswith("uid-table.glb")

    def test_offline_is_noop(self, tmp_path, monkeypatch):
        monkeypatch.delenv(OI.MIRROR_ENV, raising=False)
        out = OI.download_objects(["uid-nowhere"], str(tmp_path / "dl"))
        assert out == {}  # no raise

    def test_preview_reuse(self, tmp_path, monkeypatch):
        monkeypatch.delenv("AUTOVFX_ALLOW_HUB_DOWNLOAD", raising=False)
        folder = tmp_path / "prev" / "uid-dragon"
        folder.mkdir(parents=True)
        for v in range(4):  # complete folder (>= min_views)
            (folder / f"{v:05d}.png").write_bytes(b"png")
        out = OI.download_gobjaverse_previews(
            {"uid-dragon": "0/12345"}, str(tmp_path / "prev")
        )
        assert out == {"uid-dragon": str(folder)}

    def test_preview_partial_not_reused(self, tmp_path, monkeypatch):
        # a partially-downloaded folder must NOT register as present,
        # and with downloads disabled the uid is dropped (no network)
        monkeypatch.delenv("AUTOVFX_ALLOW_HUB_DOWNLOAD", raising=False)
        folder = tmp_path / "prev" / "uid-dragon"
        folder.mkdir(parents=True)
        (folder / "00000.png").write_bytes(b"png")
        out = OI.download_gobjaverse_previews(
            {"uid-dragon": "0/12345"}, str(tmp_path / "prev")
        )
        assert out == {}


class TestWrapperIntegration:
    def test_retrieve_resolves_from_index(self, index_path, tmp_path,
                                          monkeypatch):
        monkeypatch.setattr(OI, "_sbert_embed", lambda texts: None)
        monkeypatch.setenv(OI.INDEX_ENV, index_path)
        monkeypatch.setenv("AUTOVFX_CACHE_DIR", str(tmp_path / "cache"))
        monkeypatch.setattr(W, "_clip", lambda: None)  # skip CLIP re-rank
        mirror = tmp_path / "mirror"
        mirror.mkdir()
        for uid in ENTRIES:
            (mirror / f"{uid}.glb").write_bytes(b"glb")
        monkeypatch.setenv(OI.MIRROR_ENV, str(mirror))
        # hash-embed cosine needs most tokens shared to clear the 0.6
        # reference threshold; a full-name query models the SBERT regime
        info = W.retrieve_asset_from_objaverse("orange basketball ball sport")
        assert info["object_id"] in ENTRIES
        assert info["object_path"].endswith(".glb")
        assert os.path.exists(info["object_path"])

    def test_offline_falls_back_to_local_library(self, index_path,
                                                 tmp_path, monkeypatch):
        """Index hits that can't be downloaded → local library path
        unchanged (the VERDICT's 'offline fallback unchanged')."""
        monkeypatch.setattr(OI, "_sbert_embed", lambda texts: None)
        monkeypatch.setenv(OI.INDEX_ENV, index_path)
        monkeypatch.setenv("AUTOVFX_CACHE_DIR", str(tmp_path / "cache"))
        monkeypatch.delenv(OI.MIRROR_ENV, raising=False)
        lib = tmp_path / "lib"
        lib.mkdir()
        (lib / "basketball.obj").write_text("v 0 0 0\n")
        monkeypatch.setenv(W.ASSET_DIR_ENV, str(lib))
        monkeypatch.setattr(W, "_clip", lambda: None)
        monkeypatch.setattr(W, "_sbert", lambda: None)
        info = W.retrieve_asset_from_objaverse("basketball")
        assert info["object_path"] == str(lib / "basketball.obj")

    def test_no_index_no_library_raises(self, tmp_path, monkeypatch):
        monkeypatch.delenv(OI.INDEX_ENV, raising=False)
        monkeypatch.setenv("AUTOVFX_CACHE_DIR", str(tmp_path / "empty"))
        monkeypatch.delenv(W.ASSET_DIR_ENV, raising=False)
        monkeypatch.setattr(W, "_sbert", lambda: None)
        with pytest.raises(W.AssetNotFound):
            W.retrieve_asset_from_objaverse("basketball")


class TestBuildScript:
    def test_cli_scan_dir(self, tmp_path, monkeypatch):
        import subprocess
        import sys

        lib = tmp_path / "lib"
        lib.mkdir()
        (lib / "red_cube.obj").write_text("v 0 0 0\n")
        out = tmp_path / "idx.npz"
        r = subprocess.run(
            [sys.executable, "scripts/build_objaverse_index.py",
             "--scan-dir", str(lib), "--out", str(out),
             "--embedder", "hash"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr
        idx = OI.ObjaverseIndex.load(str(out))
        assert list(idx.uids) == ["red_cube"]
