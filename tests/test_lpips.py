"""Native LPIPS-VGG: the Flax network + torch->Flax converter reproduce the
lpips package's math (reference deeplens/utils.py:38-45,
lpips.LPIPS(net='vgg', spatial=True)) numerically on random real-layout
state dicts — the same oracle style as the ResNet18 converter proof
(tests/test_dfv_convert.py)."""
import os

import numpy as np
import pytest

from aadff_tpu.models.lpips import (
    TORCH_CONV_IDX,
    VGG_SLICES,
    LPIPSVgg,
    convert_lpips_vgg,
    load_lpips_msgpack,
    save_lpips_msgpack,
)

_SHIFT = [-0.030, -0.088, -0.188]
_SCALE = [0.458, 0.448, 0.450]


def _random_vgg_state_dicts(seed=0):
    """torchvision-vgg16-features-layout + lpips-lin-layout state dicts with
    random weights (zero-filled dicts would only test shapes)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    feats, lins = {}, {}
    in_c = 3
    ci = 0
    for ch, n_convs in VGG_SLICES:
        for _ in range(n_convs):
            ti = TORCH_CONV_IDX[ci]
            feats[f"features.{ti}.weight"] = (
                torch.randn(ch, in_c, 3, 3, generator=g) * 0.05)
            feats[f"features.{ti}.bias"] = torch.randn(ch, generator=g) * 0.1
            in_c = ch
            ci += 1
    for k, (ch, _) in enumerate(VGG_SLICES):
        # real lpips lin weights are non-negative; keep that property
        lins[f"lin{k}.model.1.weight"] = torch.rand(1, ch, 1, 1, generator=g)
    return feats, lins


def _torch_lpips_forward(feats, lins, x0, x1):
    """Functional torch forward of lpips.LPIPS(net='vgg', spatial=True):
    ScalingLayer -> vgg16 features taps (relu1_2..relu5_3) ->
    channel-unit-normalize -> squared diff -> 1x1 lin heads -> bilinear
    upsample (align_corners=False) -> sum over taps."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def taps(x):
        h = (x - shift) / scale
        out = []
        ci = 0
        with torch.no_grad():
            for si, (ch, n_convs) in enumerate(VGG_SLICES):
                if si:
                    h = F.max_pool2d(h, 2, 2)
                for _ in range(n_convs):
                    ti = TORCH_CONV_IDX[ci]
                    h = F.relu(F.conv2d(h, feats[f"features.{ti}.weight"],
                                        feats[f"features.{ti}.bias"],
                                        padding=1))
                    ci += 1
                out.append(h)
        return out

    with torch.no_grad():
        total = None
        for k, (t0, t1) in enumerate(zip(taps(x0), taps(x1))):
            n0 = t0 / (t0.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            n1 = t1 / (t1.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = F.conv2d((n0 - n1) ** 2, lins[f"lin{k}.model.1.weight"])
            d = F.interpolate(d, size=x0.shape[2:], mode="bilinear",
                              align_corners=False)
            total = d if total is None else total + d
    return total


def test_lpips_converter_numerics():
    import jax.numpy as jnp
    import torch

    feats, lins = _random_vgg_state_dicts()
    variables = convert_lpips_vgg(feats, lins)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), -1, 1).astype(np.float32)

    ref = _torch_lpips_forward(feats, lins, torch.tensor(x),
                               torch.tensor(y)).numpy()
    ours = LPIPSVgg().apply(
        variables,
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
        jnp.transpose(jnp.asarray(y), (0, 2, 3, 1)))
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    rel = np.linalg.norm(ours_nchw - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, f"LPIPS maps diverge: rel {rel:.2e}"
    # identical inputs -> exactly zero distance
    zero = LPIPSVgg().apply(
        variables,
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(zero), 0.0, atol=1e-7)


def test_batch_lpips_native_backend(tmp_path, monkeypatch):
    """batch_LPIPS picks up converted weights via AADFF_LPIPS_WEIGHTS and
    round-trips them through the msgpack save/load helpers."""
    feats, lins = _random_vgg_state_dicts(seed=2)
    variables = convert_lpips_vgg(feats, lins)
    path = str(tmp_path / "lpips_vgg.msgpack")
    save_lpips_msgpack(variables, path)
    loaded = load_lpips_msgpack(path)
    k0 = np.asarray(loaded["params"]["vgg"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(
        k0, np.asarray(variables["params"]["vgg"]["Conv_0"]["kernel"]))

    monkeypatch.setenv("AADFF_LPIPS_WEIGHTS", path)
    from aadff_tpu.utils.quality import batch_LPIPS

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    clean = np.clip(img + 0.2 * rng.standard_normal(img.shape),
                    0, 1).astype(np.float32)
    d_same = batch_LPIPS(img, img)
    d_diff = batch_LPIPS(img, clean)
    assert d_same == pytest.approx(0.0, abs=1e-7)
    assert d_diff > d_same


def test_validate_emits_lpips_when_weights_exist(tmp_path, monkeypatch):
    """`train.trainer.validate` reports LPIPS when converted weights exist
    and skips the metric cleanly otherwise (reference treats LPIPS as a
    first-class quality metric, deeplens/utils.py:15-45)."""
    from aadff_tpu.psfnet import ThinLens
    from aadff_tpu.train.trainer import validate

    feats, lins = _random_vgg_state_dicts(seed=4)
    path = str(tmp_path / "lpips_vgg.msgpack")
    save_lpips_msgpack(convert_lpips_vgg(feats, lins), path)

    H = W = 32
    n_stack = 4
    rng = np.random.default_rng(5)
    aif = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    depth = rng.uniform(0.5, 3.0, (1, 1, H, W)).astype(np.float32)
    lens = ThinLens(50.0, 1.8, 7, [4.0, 4.0], (H, W))

    def eval_step(state, stack, fds):
        # echo frame 0 as the AiF prediction; constant depth
        return {"pred_depth": np.full((1, 1, H, W), 1.5, np.float32),
                "pred_AiF_img": np.transpose(np.asarray(stack)[:, 0],
                                             (0, 3, 1, 2))}

    args = {"results_dir": str(tmp_path)}
    monkeypatch.setenv("AADFF_LPIPS_WEIGHTS", path)
    scores = validate(eval_step, None, lens, [(aif, depth)], n_stack,
                      epoch=1, args=args, save_images=False)
    assert "lpips" in scores and np.isfinite(scores["lpips"])
    assert scores["lpips"] >= 0.0

    monkeypatch.setenv("AADFF_LPIPS_WEIGHTS", "/nonexistent/lpips.msgpack")
    scores2 = validate(eval_step, None, lens, [(aif, depth)], n_stack,
                       epoch=1, args=args, save_images=False)
    assert "lpips" not in scores2  # skipped cleanly, suite unchanged


def test_lpips_available_native_only_ignores_pip_install(monkeypatch):
    """validate() gates LPIPS on converted native weights only
    (native_only=True): a merely-importable `lpips` package is NOT a safe
    backend there — constructing lpips.LPIPS downloads pretrained weights,
    which offline would turn a skippable metric into a mid-validate crash,
    and its AlexNet default is a different metric than the native VGG."""
    import sys
    import types

    from aadff_tpu.utils import quality

    monkeypatch.setenv("AADFF_LPIPS_WEIGHTS", "/nonexistent/lpips.msgpack")
    fake = types.ModuleType("lpips")
    fake.__file__ = "/fake/site-packages/lpips/__init__.py"
    monkeypatch.setitem(sys.modules, "lpips", fake)
    assert quality.lpips_available() is True
    assert quality.lpips_available(native_only=True) is False


def test_batch_lpips_still_gated_without_weights(monkeypatch):
    """Without converted weights or a real lpips install the gate still
    raises its clear error (environment has neither)."""
    monkeypatch.setenv("AADFF_LPIPS_WEIGHTS", "/nonexistent/lpips.msgpack")
    from aadff_tpu.utils.quality import batch_LPIPS

    img = np.zeros((1, 3, 8, 8), np.float32)
    with pytest.raises(RuntimeError, match="lpips"):
        batch_LPIPS(img, img)
