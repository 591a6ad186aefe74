"""Tests for the native JAX LaMa (big-lama FFC-ResNet) inpainting path.

Three layers of evidence:
1. converter + forward on a hand-built tiny state dict (no torch needed);
2. torch parity against the reference's vendored saicinpainting generator
   (gated on /root/reference and torch being importable) — random tiny
   checkpoint, eval-mode forward, elementwise comparison;
3. wrapper integration: checkpoint present -> net runs; absent -> TELEA.
"""
import os
import sys

import numpy as np
import pytest

from autovfx_tpu.perception import lama_jax

RNG = np.random.default_rng(7)


def _bn_entries(sd, prefix, c):
    sd[prefix + ".weight"] = RNG.normal(1.0, 0.1, c).astype(np.float32)
    sd[prefix + ".bias"] = RNG.normal(0.0, 0.1, c).astype(np.float32)
    sd[prefix + ".running_mean"] = RNG.normal(0.0, 0.3, c).astype(np.float32)
    sd[prefix + ".running_var"] = (
        0.5 + RNG.random(c).astype(np.float32)
    )
    sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _conv_w(sd, key, cout, cin, k):
    sd[key] = (RNG.normal(0, 0.2, (cout, cin, k, k)) / (k * np.sqrt(cin))
               ).astype(np.float32)


def _ffc_entries(sd, p, cin, cout, rin, rout, k):
    """Emit FFC_BN_ACT keys exactly as torch would name them."""
    in_g, out_g = int(cin * rin), int(cout * rout)
    in_l, out_l = cin - in_g, cout - out_g
    if in_l and out_l:
        _conv_w(sd, f"{p}.ffc.convl2l.weight", out_l, in_l, k)
    if in_l and out_g:
        _conv_w(sd, f"{p}.ffc.convl2g.weight", out_g, in_l, k)
    if in_g and out_l:
        _conv_w(sd, f"{p}.ffc.convg2l.weight", out_l, in_g, k)
    if in_g and out_g:
        g = f"{p}.ffc.convg2g"
        _conv_w(sd, g + ".conv1.0.weight", out_g // 2, in_g, 1)
        _bn_entries(sd, g + ".conv1.1", out_g // 2)
        _conv_w(sd, g + ".fu.conv_layer.weight", out_g, out_g, 1)
        _bn_entries(sd, g + ".fu.bn", out_g)
        _conv_w(sd, g + ".conv2.weight", out_g, out_g // 2, 1)
    if out_l:
        _bn_entries(sd, f"{p}.bn_l", out_l)
    if out_g:
        _bn_entries(sd, f"{p}.bn_g", out_g)


def tiny_state_dict(ngf=8, nd=2, nb=2, ratio=0.75, in_nc=4, out_nc=3):
    """big-lama-shaped generator state dict at toy size.

    Sequential layout mirrors ffc.py:311-366: pad, stem, nd downsamples
    (last one opens the global branch), nb residual blocks, concat,
    nd (convT, bn, act) triples, pad, out conv.
    """
    sd = {}
    i = 1
    _ffc_entries(sd, f"model.{i}", in_nc, ngf, 0.0, 0.0, 7)
    i += 1
    for d in range(nd):
        cin, cout = ngf * 2 ** d, ngf * 2 ** (d + 1)
        rout = ratio if d == nd - 1 else 0.0
        _ffc_entries(sd, f"model.{i}", cin, cout, 0.0, rout, 3)
        i += 1
    feat = ngf * 2 ** nd
    for _ in range(nb):
        _ffc_entries(sd, f"model.{i}.conv1", feat, feat, ratio, ratio, 3)
        _ffc_entries(sd, f"model.{i}.conv2", feat, feat, ratio, ratio, 3)
        i += 1
    i += 1  # ConcatTupleLayer holds no params
    for u in range(nd):
        cin = ngf * 2 ** (nd - u)
        cout = cin // 2
        # ConvTranspose2d weight is (in, out, kh, kw), bias (out,)
        sd[f"model.{i}.weight"] = (
            RNG.normal(0, 0.2, (cin, cout, 3, 3)) / (3 * np.sqrt(cin))
        ).astype(np.float32)
        sd[f"model.{i}.bias"] = RNG.normal(0, 0.1, cout).astype(np.float32)
        _bn_entries(sd, f"model.{i + 1}", cout)
        i += 3  # convT, bn, relu
    i += 1  # ReflectionPad2d
    _conv_w(sd, f"model.{i}.weight", out_nc, ngf, 7)
    sd[f"model.{i}.bias"] = RNG.normal(0, 0.1, out_nc).astype(np.float32)
    return sd


def test_converter_structure():
    params = lama_jax.convert_torch_state_dict(tiny_state_dict())
    assert len(params.down) == 2
    assert len(params.blocks) == 2
    assert len(params.up) == 2
    assert params.init["l2l"].shape == (7, 7, 4, 8)
    assert params.init["g2g"] is None
    # last downsample opens the global branch at ratio 0.75
    d1 = params.down[1]
    assert d1["l2l"].shape[-1] == 32 - 24  # out_l
    assert d1["l2g"].shape[-1] == 24
    blk = params.blocks[0]["conv1"]
    assert blk["g2g"]["conv1"].shape == (1, 1, 24, 12)
    # FourierUnit convolves interleaved (re, im) of out_g // 2 channels
    assert blk["g2g"]["fu"].shape == (1, 1, 24, 24)
    assert params.out_w.shape == (7, 7, 8, 3)


def test_forward_shape_range_and_composite():
    params = lama_jax.convert_torch_state_dict(tiny_state_dict())
    img = RNG.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    mask = np.zeros((37, 53), np.uint8)
    mask[10:20, 15:30] = 1
    out = lama_jax.inpaint_with_params(params, img, mask)
    assert out.shape == img.shape and out.dtype == np.uint8
    # outside the hole the composite must return the input verbatim
    # (up to the float->u8 round trip)
    keep = mask == 0
    assert np.abs(out[keep].astype(int) - img[keep].astype(int)).max() <= 1
    # inside the hole the net output must differ from the (zeroed) input
    assert out[~keep].std() > 0


def test_forward_jits_with_static_shapes():
    import jax

    params = lama_jax.convert_torch_state_dict(tiny_state_dict(nb=1))
    x = np.asarray(RNG.normal(0, 1, (1, 16, 24, 4)), np.float32)
    y = jax.jit(lama_jax.lama_generator)(params, x)
    assert y.shape == (1, 16, 24, 3)
    assert np.isfinite(np.asarray(y)).all()
    assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()


REF_LAMA = "/root/reference/inpaint/lama"


def _load_reference_generator():
    """Import the vendored saicinpainting FFC generator with the heavy
    side-imports (kornia, pytorch_lightning) stubbed out — only the pure
    torch module tree is exercised."""
    import types

    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF_LAMA):
        pytest.skip("reference LaMa sources not available")
    for name, attrs in (
        ("kornia", {}),
        ("kornia.geometry", {}),
        ("kornia.geometry.transform", {"rotate": lambda *a, **k: None}),
        ("pytorch_lightning", {"seed_everything": lambda *a, **k: None}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.path.insert(0, REF_LAMA)
    try:
        from saicinpainting.training.modules.ffc import FFCResNetGenerator
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"reference saicinpainting unimportable: {e}")
    finally:
        sys.path.remove(REF_LAMA)
    return torch, FFCResNetGenerator


@pytest.mark.slow
def test_parity_with_reference_torch_generator():
    torch, FFCResNetGenerator = _load_reference_generator()
    kw = dict(ratio_gin=0.0, ratio_gout=0.0, enable_lfu=False)
    net = FFCResNetGenerator(
        4, 3, ngf=8, n_downsampling=2, n_blocks=2,
        init_conv_kwargs=kw, downsample_conv_kwargs=dict(kw),
        resnet_conv_kwargs=dict(ratio_gin=0.75, ratio_gout=0.75,
                                enable_lfu=False),
        add_out_act="sigmoid",
    )
    # randomize BN running stats so stat folding is actually tested
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()
    x = torch.from_numpy(
        np.asarray(RNG.normal(0, 1, (1, 4, 32, 40)), np.float32)
    )
    with torch.no_grad():
        ref = net(x).numpy()
    params = lama_jax.convert_torch_state_dict(net.state_dict())
    got = np.asarray(
        lama_jax.lama_generator(params, np.transpose(x.numpy(), (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.transpose(got, (0, 3, 1, 2)), ref, atol=2e-5, rtol=1e-4
    )


def test_wrapper_uses_net_when_ckpt_present(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    from autovfx_tpu.perception.wrappers import inpaint_img_with_lama

    ckpt = tmp_path / "tiny-lama.ckpt"
    sd = {"generator." + k if k.startswith("model.") else k: torch.from_numpy(
        np.asarray(v)) for k, v in tiny_state_dict().items()}
    torch.save({"state_dict": sd}, str(ckpt))
    img = RNG.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    mask = np.zeros((24, 24), np.uint8)
    mask[8:16, 8:16] = 255
    out_net = inpaint_img_with_lama(img, mask, ckpt_path=str(ckpt))
    assert out_net.shape == img.shape
    keep = mask == 0
    assert np.abs(out_net[keep].astype(int) - img[keep].astype(int)).max() <= 1
    # and without any checkpoint the TELEA fallback still answers
    monkeypatch.delenv("AUTOVFX_LAMA_CKPT", raising=False)
    out_fb = inpaint_img_with_lama(img, mask)
    assert out_fb.shape == img.shape


def test_ckpt_dir_resolution(tmp_path):
    torch = pytest.importorskip("torch")
    d = tmp_path / "big-lama" / "models"
    d.mkdir(parents=True)
    sd = {("generator." + k if k.startswith("model.") else k):
          torch.from_numpy(np.asarray(v))
          for k, v in tiny_state_dict(nb=1).items()}
    torch.save({"state_dict": sd}, str(d / "best.ckpt"))
    params = lama_jax.load_lama_params(str(tmp_path / "big-lama"))
    assert len(params.blocks) == 1
