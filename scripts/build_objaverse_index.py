#!/usr/bin/env python
"""Build a precomputed Objaverse embedding index.

Replaces the reference's offline SBERT-db pickles + obj2idx JSON
(``retrieval/wrapper_objaverse.py:20-26``) with one self-describing
``.npz`` (see ``autovfx_tpu/retrieval/objaverse_index.py``).

Input metadata (pick one):
  --metadata meta.json      {uid: {name, tags?, animated?, gobj_index?}}
  --scan-dir assets/        index <name>.glb files in a local library
                            (uid = stem, animated via glTF channels)

Usage:
  python scripts/build_objaverse_index.py --metadata meta.json \
      --out _cache/objaverse_index.npz [--embedder auto|sbert|hash]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autovfx_tpu.retrieval.objaverse_index import build_index  # noqa: E402
from autovfx_tpu.retrieval.wrappers import glb_has_animation  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metadata", help="JSON {uid: {name, tags, ...}}")
    ap.add_argument("--scan-dir", help="local asset dir to index")
    ap.add_argument("--out", required=True)
    ap.add_argument("--embedder", default="auto",
                    choices=["auto", "sbert", "hash"])
    args = ap.parse_args()

    entries = {}
    if args.metadata:
        with open(args.metadata) as f:
            entries.update(json.load(f))
    if args.scan_dir:
        for ext in ("glb", "gltf", "obj", "ply"):
            for p in glob.glob(
                os.path.join(args.scan_dir, f"**/*.{ext}"), recursive=True
            ):
                uid = os.path.splitext(os.path.basename(p))[0]
                entries.setdefault(uid, {
                    "name": uid.replace("_", " "),
                    "animated": glb_has_animation(p),
                })
    if not entries:
        ap.error("no entries: pass --metadata and/or --scan-dir")

    index = build_index(entries, out_path=args.out, embedder=args.embedder)
    print(f"wrote {args.out}: {len(index.uids)} assets, "
          f"D={index.database.shape[1]}, embedder={index.embedder}, "
          f"animated={'yes' if index.animated is not None else 'no'}")


if __name__ == "__main__":
    main()
