"""Pallas kernel correctness (interpret mode on the CPU test mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from aadff_tpu.ops.pallas_mlp import flax_mlp_weights, mlp_psf_pallas
from aadff_tpu.psfnet import MLP


def test_pallas_mlp_matches_xla():
    model = MLP(in_features=4, out_features=121, hidden_features=256,
                hidden_layers=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    weights = flax_mlp_weights(variables)

    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.uniform(-1, 1, (2048, 4)).astype(np.float32))
    ref = model.apply(variables, field)
    out = mlp_psf_pallas(field, weights, 121, interpret=True, tile=1024)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # rows are L1-normalised PSFs
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_pallas_mlp_bf16_accuracy_gate():
    """The production bf16 MXU path must stay below the surrogate's own model
    error: per-row L1 distance to the f32 output well under the ~2e-3 L1/px
    quality gate of the converted reference checkpoint (PARITY.md)."""
    model = MLP(in_features=4, out_features=121, hidden_features=256,
                hidden_layers=8)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 4)))
    weights = flax_mlp_weights(variables)
    rng = np.random.default_rng(2)
    field = jnp.asarray(rng.uniform(-1, 1, (2048, 4)).astype(np.float32))

    ref = np.asarray(model.apply(variables, field))
    out = np.asarray(mlp_psf_pallas(field, weights, 121, interpret=True,
                                    tile=1024, compute_dtype=jnp.bfloat16))
    # rows remain valid normalised PSFs
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
    l1_per_px = np.abs(out - ref).mean()
    assert l1_per_px < 5e-4, l1_per_px


def test_psfnet_render_bf16_matches_f32():
    """End-to-end render with the bf16 Pallas path stays within the model's
    own error band of the f32 XLA path."""
    from aadff_tpu.psfnet import PSFNet

    net = PSFNet("/root/reference/lenses/rf50mm/lens.json", kernel_size=11,
                 sensor_res=(64, 64))
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    depth = -rng.uniform(500, 15000, (1, 1, 64, 64)).astype(np.float32)
    foc = np.asarray([-2400.0], np.float32)

    f32 = np.asarray(net.render(img, depth, foc, use_pallas=False))
    net.render_dtype = "bf16"
    bf16 = np.asarray(net.render(img, depth, foc, use_pallas=True))
    err = np.abs(bf16 - f32).max()
    assert err < 2e-3, err


def test_fused_render_kernel_matches_xla_path():
    """The fully-fused MLP+conv kernel (ops/pallas_render.py) is exact vs the
    production path (pallas-MLP via interpret + XLA tap conv) on the same
    inputs — interpret-mode parity so the DMA/tile choreography can't bit-rot
    (ADVICE.md r1, low)."""
    from aadff_tpu.ops.pallas_render import TH, TW, fused_render_frame
    from aadff_tpu.ops.render import local_psf_render

    ks = 11
    H, W = 2 * TH, TW  # one tile column, two rows
    model = MLP(in_features=4, out_features=ks * ks, hidden_features=256,
                hidden_layers=8)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 4)))

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32))
    depth = jnp.asarray(-rng.uniform(500, 15000, (1, 1, H, W)).astype(np.float32))
    foc = jnp.asarray([-2400.0], jnp.float32)
    d_min, d_max = -200.0, -20000.0  # PSFNet's normalisation endpoints

    # reference: XLA field -> MLP -> local_psf_render
    z = jnp.clip((depth.reshape(1, H, W) - d_min) / (d_max - d_min), 0, 1)
    x, y = jnp.meshgrid(jnp.linspace(-1, 1, W), jnp.linspace(1, -1, H),
                        indexing="xy")
    foc_z = jnp.clip((foc[:, None, None] - d_min) / (d_max - d_min), 0, 1)
    o = jnp.stack([jnp.broadcast_to(x, (1, H, W)),
                   jnp.broadcast_to(y, (1, H, W)), z,
                   jnp.broadcast_to(foc_z, (1, H, W))], axis=-1)
    psf = model.apply(variables, o.reshape(-1, 4)).reshape(1, H, W, ks, ks)
    ref = np.asarray(local_psf_render(img, psf, kernel_size=ks))

    out = np.asarray(fused_render_frame(
        variables, img, depth, foc, ks, d_min, d_max, interpret=True
    ))
    np.testing.assert_allclose(out, ref, atol=5e-6)


def test_psfnet_render_uses_fused_kernel_when_aligned():
    """At tile-aligned sensor resolutions the production pallas render path
    dispatches the fused MLP+conv kernel.  render_dtype='f32' (the production
    default — same single-pass-bf16 MXU throughput, no per-layer VPU cast,
    DESIGN.md §4) matches the XLA path exactly; explicit 'bf16' (wired through
    to the fused kernel) stays inside the surrogate's own error band."""
    from aadff_tpu.psfnet import PSFNet

    net = PSFNet("/root/reference/lenses/rf50mm/lens.json", kernel_size=11,
                 sensor_res=(16, 128), render_dtype="f32")
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (2, 3, 16, 128)).astype(np.float32)
    depth = -rng.uniform(500, 15000, (2, 1, 16, 128)).astype(np.float32)
    foc = np.asarray([-2400.0, -900.0], np.float32)

    xla = np.asarray(net.render(img, depth, foc, use_pallas=False))
    fused = np.asarray(net.render(img, depth, foc, use_pallas=True))
    np.testing.assert_allclose(fused, xla, atol=5e-6)

    net.render_dtype = "bf16"
    fused_bf16 = np.asarray(net.render(img, depth, foc, use_pallas=True))
    err = np.abs(fused_bf16 - xla).max()
    assert 0 < err < 2e-3, err  # ran in bf16, inside the accuracy gate


def test_pallas_mlp_handles_ragged_n():
    """N not a multiple of the tile is padded and sliced back."""
    model = MLP(in_features=4, out_features=121, hidden_features=256,
                hidden_layers=8)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4)))
    weights = flax_mlp_weights(variables)
    field = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (1500, 4)).astype(np.float32)
    )
    out = mlp_psf_pallas(field, weights, 121, interpret=True, tile=1024)
    assert out.shape == (1500, 121)
    ref = model.apply(variables, field)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_tile_height_eligibility():
    """fused_tile_height is the single source of truth for fused-path
    eligibility (PSFNet's render dispatch and bench.py's path label both
    call it): largest of 32/16/8 dividing H when W is lane-aligned."""
    from aadff_tpu.ops.pallas_render import TW, fused_tile_height

    assert TW == 128
    assert fused_tile_height(480, 640) == 32   # production resolution
    assert fused_tile_height(16, 640) == 16
    assert fused_tile_height(8, 128) == 8
    assert fused_tile_height(12, 640) is None  # H not 8/16/32-divisible
    assert fused_tile_height(480, 630) is None  # W not lane-aligned


def test_render_path_label_tracks_backend_and_resolution():
    from aadff_tpu.psfnet import PSFNet

    net = PSFNet("/root/reference/lenses/rf50mm/lens.json", kernel_size=11,
                 sensor_res=(32, 128))
    # CPU backend -> pallas off by default -> XLA two-stage label
    assert net.render_path() == "xla-mlp+scan(f32)"
    assert net.render_path(use_pallas=True) == "fused-mlp+conv(f32,tile32x128)"
    net.render_dtype = "bf16"
    assert net.render_path(use_pallas=True) == "fused-mlp+conv(bf16,tile32x128)"
    off = PSFNet("/root/reference/lenses/rf50mm/lens.json", kernel_size=11,
                 sensor_res=(30, 128))  # not tile-aligned
    assert off.render_path(use_pallas=True) == "pallas-mlp(f32)+scan"


def test_fused_render_stack_matches_frame_loop():
    """The whole-stack fused kernel (grid (H/th, W/tw, S), frame innermost,
    halo DMA'd once per tile at s == 0 and reused from scratch) matches a
    per-frame loop over the single-frame fused kernel exactly — interpret-
    mode parity so the scratch-reuse choreography can't bit-rot."""
    from aadff_tpu.ops.pallas_render import (fused_render_frame,
                                             fused_render_stack)

    ks, S = 11, 3
    H, W = 64, 128  # two 32-row tiles; exercises halo reuse across tiles
    model = MLP(in_features=4, out_features=ks * ks, hidden_features=256,
                hidden_layers=8)
    variables = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 4)))

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (2, 3, H, W)).astype(np.float32))
    depth = jnp.asarray(-rng.uniform(500, 15000, (2, 1, H, W)).astype(np.float32))
    focus_dists = jnp.asarray(
        -np.sort(rng.uniform(500, 15000, (2, S)))[:, ::-1].copy(), jnp.float32)
    d_min, d_max = -200.0, -20000.0

    stack = np.asarray(fused_render_stack(
        variables, img, depth, focus_dists, ks, d_min, d_max, interpret=True))
    assert stack.shape == (2, S, 3, H, W)
    for s in range(S):
        frame = np.asarray(fused_render_frame(
            variables, img, depth, focus_dists[:, s], ks, d_min, d_max,
            interpret=True))
        np.testing.assert_allclose(stack[:, s], frame, rtol=0, atol=1e-6)

    # the parallel-spatial-dims grid annotation (bench 'fusedstackpp') is a
    # scheduling hint only — results must be identical
    stack_pp = np.asarray(fused_render_stack(
        variables, img, depth, focus_dists, ks, d_min, d_max, interpret=True,
        dim_semantics=("parallel", "parallel", "arbitrary")))
    np.testing.assert_allclose(stack_pp, stack, rtol=0, atol=0)


def test_psfnet_render_stack_uses_fused_stack_kernel():
    """PSFNet.render_stack default (stack_kernel=True, the production path)
    dispatches fused_render_stack and matches per-frame renders."""
    from aadff_tpu.psfnet import PSFNet

    net = PSFNet("/root/reference/lenses/rf50mm/lens.json", kernel_size=11,
                 sensor_res=(16, 128))
    assert net.stack_kernel is True  # production default since r4
    rng = np.random.default_rng(6)
    img = rng.uniform(0, 1, (1, 3, 16, 128)).astype(np.float32)
    depth = -rng.uniform(500, 15000, (1, 1, 16, 128)).astype(np.float32)
    focus_dists = np.asarray([[-2400.0, -900.0]], np.float32)

    stack = np.asarray(net.render_stack(img, depth, focus_dists,
                                        use_pallas=True))
    for s in range(2):
        frame = np.asarray(net.render(img, depth, focus_dists[:, s],
                                      use_pallas=True))
        np.testing.assert_allclose(stack[:, s], frame, rtol=0, atol=1e-6)


def test_psfnet_render_stack_per_frame_loop_opt_out():
    """With stack_kernel=False (opt-out), render_stack takes the
    lax.map-of-frames path and still matches per-frame renders."""
    from aadff_tpu.psfnet import PSFNet

    net = PSFNet("/root/reference/lenses/rf50mm/lens.json", kernel_size=11,
                 sensor_res=(16, 128))
    net.stack_kernel = False
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (1, 3, 16, 128)).astype(np.float32)
    depth = -rng.uniform(500, 15000, (1, 1, 16, 128)).astype(np.float32)
    focus_dists = np.asarray([[-2400.0, -900.0]], np.float32)

    stack = np.asarray(net.render_stack(img, depth, focus_dists,
                                        use_pallas=True))
    for s in range(2):
        frame = np.asarray(net.render(img, depth, focus_dists[:, s],
                                      use_pallas=True))
        np.testing.assert_allclose(stack[:, s], frame, rtol=0, atol=1e-6)
