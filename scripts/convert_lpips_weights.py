#!/usr/bin/env python
"""Convert torch VGG16 + lpips(vgg) checkpoints to the npz consumed by
``autovfx_tpu.utils.lpips_jax`` (``AUTOVFX_LPIPS_WEIGHTS``).

Run OFFLINE on any box with the downloaded weights:

    python scripts/convert_lpips_weights.py \
        --vgg16 ~/.cache/torch/hub/checkpoints/vgg16-397923af.pth \
        --lpips ~/.../lpips/weights/v0.1/vgg.pth \
        --out lpips_vgg.npz

or, with the ``lpips`` pip package importable (it bundles the heads and
pulls torchvision's VGG):

    python scripts/convert_lpips_weights.py --from-package --out lpips_vgg.npz

Then point ``AUTOVFX_LPIPS_WEIGHTS=lpips_vgg.npz`` — reported LPIPS
becomes canonical LPIPS(vgg), comparable to the reference's
``sugar/metrics.py`` numbers.
"""
import argparse

import numpy as np

from autovfx_tpu.utils.lpips_jax import convert_torch_lpips


def _to_np(state):
    return {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
            for k, v in state.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg16", help="torchvision vgg16 .pth state dict")
    ap.add_argument("--lpips", help="lpips package vgg.pth (linear heads)")
    ap.add_argument("--from-package", action="store_true",
                    help="pull both from the lpips pip package")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    if args.from_package:
        import lpips as lpips_pkg

        model = lpips_pkg.LPIPS(net="vgg")
        # lpips stores the backbone under slice wrappers; pull the flat
        # torchvision naming from torchvision directly
        from torchvision.models import vgg16

        vgg_state = _to_np(vgg16(weights="IMAGENET1K_V1").state_dict())
        lpips_state = _to_np(model.state_dict())
    else:
        assert args.vgg16 and args.lpips, "--vgg16 and --lpips required"
        vgg_state = _to_np(torch.load(args.vgg16, map_location="cpu"))
        lpips_state = _to_np(torch.load(args.lpips, map_location="cpu"))

    out = convert_torch_lpips(vgg_state, lpips_state)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
