"""PSFNet + renderer oracles: weight-converter exactness, per-pixel render
parity vs the torch reference, energy conservation."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aadff_tpu.ops.render import (
    local_psf_render,
    local_psf_render_high_res,
    render_psf,
    render_psf_map,
)
from aadff_tpu.psfnet import MLP, PSFNet, ThinLens, torch_mlp_to_flax

from conftest import LENS_RF50

CKPT = "/root/reference/ckpt/rf50mm/PSFNet480x640_ks11.pkl"
RENDER_GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                              "render_goldens.npz")


@pytest.fixture(scope="module")
def render_goldens():
    return np.load(RENDER_GOLDENS)


def test_mlp_converter_matches_torch():
    """Converted Flax MLP reproduces the torch MLP bit-for-bit (to f32 eps)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    sd = torch.load(CKPT, map_location="cpu")

    # reference MLP forward (psfnet_arch.py:24-47) built directly from weights
    def torch_forward(x):
        h = x
        idxs = sorted({int(k.split(".")[1]) for k in sd if k.endswith(".weight")})
        for li, i in enumerate(idxs):
            h = tF.linear(h, sd[f"net.{i}.weight"], sd[f"net.{i}.bias"])
            if li < len(idxs) - 1:
                h = tF.relu(h)
        h = torch.sigmoid(h)
        return tF.normalize(h, p=1, dim=-1)

    x = np.random.default_rng(0).uniform(-1, 1, (32, 4)).astype(np.float32)
    with torch.no_grad():
        ref = torch_forward(torch.tensor(x)).numpy()

    model = MLP(in_features=4, out_features=121, hidden_features=256,
                hidden_layers=8)
    variables = torch_mlp_to_flax(sd)
    # JAX's default matmul precision truncates f32 inputs; compare under full
    # f32 precision (the fast path is validated end-to-end by the render test)
    with jax.default_matmul_precision("float32"):
        ours = np.asarray(model.apply(jax.tree.map(jnp.asarray, variables),
                                      jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_local_psf_render_energy_conservation():
    """Constant image + normalized PSFs -> constant image (interior pixels)."""
    B, C, H, W, ks = 1, 3, 24, 32, 7
    img = jnp.full((B, C, H, W), 0.5)
    rng = np.random.default_rng(1)
    psf = rng.uniform(0, 1, (B, H, W, ks, ks)).astype(np.float32)
    psf = psf / psf.sum(axis=(-1, -2), keepdims=True)
    out = np.asarray(local_psf_render(img, jnp.asarray(psf), kernel_size=ks))
    np.testing.assert_allclose(out, 0.5, atol=1e-5)


def test_local_psf_render_matches_torch_reference():
    """Same inputs through our scan renderer and the reference unfold renderer."""
    import torch

    from conftest import import_reference

    ref_render = import_reference("deeplens.render_psf").local_psf_render

    rng = np.random.default_rng(2)
    B, C, H, W, ks = 2, 3, 16, 20, 5
    img = rng.uniform(0, 1, (B, C, H, W)).astype(np.float32)
    psf = rng.uniform(0, 1, (B, H, W, ks, ks)).astype(np.float32)
    psf /= psf.sum(axis=(-1, -2), keepdims=True)

    with torch.no_grad():
        ref = ref_render(torch.tensor(img), torch.tensor(psf), kernel_size=ks).numpy()
    ours = np.asarray(local_psf_render(jnp.asarray(img), jnp.asarray(psf), ks))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # tiled rendering replicate-pads per patch (boundary pixels deliberately
    # differ from the untiled result) — compare tile-for-tile vs the
    # reference's own high-res tiling
    ref_high = import_reference("deeplens.render_psf").local_psf_render_high_res
    with torch.no_grad():
        ref_tiled = ref_high(torch.tensor(img), torch.tensor(psf),
                             patch_size=[8, 12], kernel_size=ks).numpy()
    tiled = np.asarray(
        local_psf_render_high_res(jnp.asarray(img), jnp.asarray(psf),
                                  patch_size=(8, 12), kernel_size=ks)
    )
    np.testing.assert_allclose(tiled, ref_tiled, atol=1e-5)


def test_render_psf_matches_torch_reference():
    import torch

    from conftest import import_reference

    _mod = import_reference("deeplens.render_psf")
    ref_render_psf = _mod.render_psf
    ref_render_psf_map = _mod.render_psf_map

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 3, 20, 20)).astype(np.float32)
    psf = rng.uniform(0, 1, (3, 5, 5)).astype(np.float32)
    psf /= psf.sum(axis=(-1, -2), keepdims=True)
    with torch.no_grad():
        ref = ref_render_psf(torch.tensor(img), torch.tensor(psf)).numpy()
    ours = np.asarray(render_psf(jnp.asarray(img), jnp.asarray(psf)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    psf_map = rng.uniform(0, 1, (3, 10, 10)).astype(np.float32)  # grid=2, ks=5
    with torch.no_grad():
        refm = ref_render_psf_map(torch.tensor(img), torch.tensor(psf_map), 2).numpy()
    oursm = np.asarray(render_psf_map(jnp.asarray(img), jnp.asarray(psf_map), 2))
    np.testing.assert_allclose(oursm, refm, atol=1e-5)


def test_psfnet_end_to_end_render_golden(render_goldens):
    """Full pipeline: converted pretrained MLP + per-pixel render == reference
    (the '0_warm_up' parity milestone, SURVEY.md §7 step 5)."""
    net = PSFNet(LENS_RF50, kernel_size=11, sensor_res=(480, 640))
    net.load_net(CKPT)
    img = render_goldens["img"]
    depth = render_goldens["depth"]
    foc = render_goldens["foc"]
    out = np.asarray(net.render(img, depth, foc))
    ref = render_goldens["rendered"]
    assert np.abs(out - ref).max() < 2e-4, np.abs(out - ref).max()

    # intermediate PSF field spot check
    H, W = img.shape[2:]
    z = np.clip((depth[:, 0] - net.d_min) / (net.d_max - net.d_min), 0, 1)
    xg, yg = np.meshgrid(np.linspace(-1, 1, W), np.linspace(1, -1, H),
                         indexing="xy")
    fz = np.clip((foc[0] - net.d_min) / (net.d_max - net.d_min), 0, 1)
    field = np.stack(
        [xg, yg, z[0], np.full_like(xg, fz)], axis=-1
    ).astype(np.float32)
    psf = np.asarray(net.pred(jnp.asarray(field)))
    np.testing.assert_allclose(
        psf[::37, ::41], render_goldens["psf_field_sample"], atol=1e-5
    )


def test_thinlens_render_golden(render_goldens):
    """ThinLens Gaussian-CoC render is deterministic -> exact parity."""
    tl = ThinLens(50.0, 1.8, 11, [25.968, 34.624], (480, 640))
    out = np.asarray(tl.render(render_goldens["img"], render_goldens["depth"],
                               render_goldens["foc"]))
    ref = render_goldens["thinlens_rendered"]
    assert np.abs(out - ref).max() < 2e-4, np.abs(out - ref).max()


def test_thinlens_render_stack_matches_frame_loop():
    """ThinLens.render_stack (one jitted program per stack) is exactly the
    per-frame render loop."""
    import jax.numpy as jnp

    tl = ThinLens(49.82, 1.87, 11, [25.968, 34.624], (48, 64))
    rng = np.random.default_rng(11)
    img = rng.uniform(0, 1, (2, 3, 48, 64)).astype(np.float32)
    depth = -rng.uniform(500, 15000, (2, 1, 48, 64)).astype(np.float32)
    fds = -np.sort(rng.uniform(500, 15000, (2, 4))).astype(np.float32)
    stack = np.asarray(tl.render_stack(img, depth, fds))
    loop = np.stack([np.asarray(tl.render(img, depth, fds[:, i]))
                     for i in range(4)], 1)
    # tolerance, not bitwise: the two sides are separately compiled XLA
    # programs (render inlined under lax.map vs standalone jit) and XLA does
    # not guarantee identical fusion/numerics across program contexts
    np.testing.assert_allclose(stack, loop, rtol=0, atol=1e-6)


def test_train_step_nan_guard():
    """Non-finite batches must not poison parameters (in-graph skip)."""
    import jax
    import jax.numpy as jnp
    import optax

    from aadff_tpu.models.aifnet import AiFDepthNet
    from aadff_tpu.train.trainer import create_train_state, make_aif_train_step

    model = AiFDepthNet(n_stack=4)
    stack = jnp.ones((1, 4, 64, 64, 3))
    fp = jnp.linspace(0.5, 3.0, 4)[None]
    optimizer = optax.adam(1e-3)
    state = create_train_state(model, optimizer, stack, fp, jax.random.PRNGKey(0))
    # NaN in the (unmasked) AiF target makes the loss itself non-finite
    step = make_aif_train_step(model, optimizer, task="DA_FS", aif_w=1.0)
    depth = jnp.full((1, 1, 64, 64), 1.7)
    aif_bad = jnp.full((1, 3, 64, 64), jnp.nan)
    params_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    state, losses = step(state, stack, fp, depth, aif_bad)
    assert float(losses["skipped_nonfinite"]) == 1.0
    leaves_b = jax.tree.leaves(params_before)
    leaves_a = jax.tree.leaves(state.params)
    assert all(np.array_equal(b, np.asarray(a)) for b, a in zip(leaves_b, leaves_a))
    assert all(np.isfinite(np.asarray(a)).all() for a in leaves_a)


def test_thinlens_render_shapes():
    tl = ThinLens(50.0, 1.8, 11, [25.968, 34.624], (480, 640))
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (1, 3, 32, 40)).astype(np.float32)
    depth = -rng.uniform(500, 15000, (1, 1, 32, 40)).astype(np.float32)
    out = np.asarray(tl.render(img, depth, np.asarray([-2400.0])))
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    # defocused render stays in a sane range
    assert out.min() >= -1e-3 and out.max() <= 1.1


def test_psfnet_train_step_decreases_loss():
    """Jitted train steps actually learn: MSE on a FIXED probe batch (fixed
    points, fixed ray-traced GT) drops after training.  Comparing medians of
    the streaming loss curve is invalid — each iteration samples a different
    focus distance, so successive losses measure different task difficulty,
    not learning progress (this made the previous version flaky)."""
    import jax
    import jax.numpy as jnp

    net = PSFNet(LENS_RF50, kernel_size=11, sensor_res=(480, 640))

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, 48)
    y = rng.uniform(-1, 1, 48)
    depth = -rng.uniform(500, 15000, 48)
    z = (depth - net.d_min) / (net.d_max - net.d_min)
    # Probe at one of the training focus distances, with the lens actually
    # refocused there — otherwise the foc_z input feature would label a lens
    # state different from the one the GT PSFs are traced at, and the probe's
    # MSE floor would measure that mismatch instead of fit quality.
    foc_idx = 10  # -2500 mm
    foc_z = np.full_like(x, net.foc_z_arr[foc_idx])
    net.lens.refocus(float(net.foc_d_arr[foc_idx]))
    inp = jnp.asarray(np.stack([x, y, z, foc_z], -1), jnp.float32)
    points = jnp.asarray(np.stack([x, y, depth], -1), jnp.float32)
    gt = np.asarray(net.psf(points, spp=256, key=jax.random.PRNGKey(3)))
    gt = gt.reshape(48, -1)

    def probe_mse():
        pred = np.asarray(net.model.apply(net.variables, inp))
        return float(np.mean((pred - gt) ** 2))

    before = probe_mse()
    losses = net.train_psfnet(iters=40, bs=32, lr=1e-3, spp=256,
                              evaluate_every=1000, result_dir="/tmp/psfnet_test")
    assert np.isfinite(losses).all()
    after = probe_mse()
    assert after < before, (before, after)
