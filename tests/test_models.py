"""Model-layer oracles: torch-geometry parity for conv wrappers, model
shapes, loss behavior, and 1-vs-N-device equivalence (SURVEY.md §4 (d))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aadff_tpu.models.aifnet import AiFDepthNet, compute_loss
from aadff_tpu.models.dfv import DFVNet, dfv_loss
from aadff_tpu.models.layers import TorchConv, TorchConvTranspose, torch_max_pool


# --------------------------------------------------------------------------
# Layer parity vs torch
# --------------------------------------------------------------------------
def test_conv_transpose_matches_torch():
    """TorchConvTranspose reproduces torch ConvTranspose3d geometry + values."""
    import torch

    rng = np.random.default_rng(0)
    cin, cout = 3, 5
    k, s, p = (3, 4, 4), (1, 2, 2), (1, 1, 1)
    x = rng.standard_normal((2, cin, 4, 6, 6)).astype(np.float32)
    w = rng.standard_normal((cin, cout, *k)).astype(np.float32) * 0.1
    b = rng.standard_normal((cout,)).astype(np.float32)

    ref = torch.nn.functional.conv_transpose3d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=s, padding=p
    ).numpy()

    model = TorchConvTranspose(cout, k, s, p)
    x_cl = jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))  # NDHWC
    variables = model.init(jax.random.PRNGKey(0), x_cl)
    # load torch weight: [in, out, *k] -> [*k, in, out]
    kernel = np.transpose(w, (2, 3, 4, 0, 1))
    variables = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(b)}}
    with jax.default_matmul_precision("float32"):
        out = model.apply(variables, x_cl)
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_conv_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    cin, cout = 4, 6
    k, s, p = (7, 7, 7), (1, 2, 2), (3, 3, 3)
    x = rng.standard_normal((1, cin, 4, 16, 16)).astype(np.float32)
    w = rng.standard_normal((cout, cin, *k)).astype(np.float32) * 0.05
    b = rng.standard_normal((cout,)).astype(np.float32)
    ref = torch.nn.functional.conv3d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=s, padding=p
    ).numpy()

    model = TorchConv(cout, k, s, p)
    x_cl = jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))
    variables = model.init(jax.random.PRNGKey(0), x_cl)
    kernel = np.transpose(w, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO
    variables = {"params": {"Conv_0": {"kernel": jnp.asarray(kernel),
                                       "bias": jnp.asarray(b)}}}
    with jax.default_matmul_precision("float32"):
        out = model.apply(variables, x_cl)
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_max_pool_matches_torch():
    import torch

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 2, 5, 9, 9)).astype(np.float32)
    ref = torch.nn.functional.max_pool3d(
        torch.tensor(x), (1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1)
    ).numpy()
    x_cl = jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))
    out = torch_max_pool(x_cl, (1, 3, 3), (1, 2, 2), (0, 1, 1))
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, atol=1e-6)


# --------------------------------------------------------------------------
# Model forward/backward
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def aif_setup():
    model = AiFDepthNet(n_stack=4)
    stack = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 4, 64, 64, 3)), jnp.float32
    )
    fp = jnp.broadcast_to(jnp.linspace(0.5, 3.0, 4), (2, 4))
    variables = model.init(jax.random.PRNGKey(0), stack, fp, train=True)
    return model, variables, stack, fp


def test_aifnet_shapes_and_attention(aif_setup):
    model, variables, stack, fp = aif_setup
    out = model.apply(variables, stack, fp, train=False)
    assert out["pred_depth"].shape == (2, 1, 64, 64)
    assert out["pred_AiF_img"].shape == (2, 3, 64, 64)
    # attention regression output is a convex combination of focus distances
    d = np.asarray(out["pred_depth"])
    assert (d >= 0.5 - 1e-4).all() and (d <= 3.0 + 1e-4).all()


def test_aifnet_train_step_decreases_loss(aif_setup):
    import optax

    from aadff_tpu.train.trainer import create_train_state, make_aif_train_step

    model, _, stack, fp = aif_setup
    optimizer = optax.adam(1e-3)
    state = create_train_state(model, optimizer, stack, fp, jax.random.PRNGKey(1))
    step = make_aif_train_step(model, optimizer, task="D_FS")
    depth = jnp.ones((2, 1, 64, 64)) * 1.7
    aif = jnp.zeros((2, 3, 64, 64))
    losses0 = None
    for i in range(5):
        state, losses = step(state, stack, fp, depth, aif)
        if losses0 is None:
            losses0 = float(losses["total"])
    assert float(losses["total"]) < losses0
    assert int(state.step) == 5


def test_aifnet_bf16_matches_f32(aif_setup):
    """bf16 trunk (dtype=jnp.bfloat16): same params, same topology, outputs
    close to the f32 forward; params/outputs stay f32 at the boundary."""
    model, variables, stack, fp = aif_setup
    model16 = AiFDepthNet(n_stack=4, dtype=jnp.bfloat16)
    out32 = model.apply(variables, stack, fp, train=False)
    out16 = model16.apply(variables, stack, fp, train=False)
    for k in ("pred_depth", "pred_AiF_img"):
        assert out16[k].dtype == jnp.float32
        # depth head is a convex combination over [0.5, 3.0]; bf16 trunk noise
        # moves attention logits slightly — bound the output displacement
        err = float(jnp.max(jnp.abs(out16[k] - out32[k])))
        assert err < 0.15, (k, err)
    # same param pytree: bf16 run must not have created/needed new params
    jax.tree_util.tree_map(lambda a: None, variables["params"])


def test_aifnet_bf16_train_step_finite_and_learns(aif_setup):
    import optax

    from aadff_tpu.train.trainer import create_train_state, make_aif_train_step

    _, _, stack, fp = aif_setup
    model16 = AiFDepthNet(n_stack=4, dtype=jnp.bfloat16)
    optimizer = optax.adam(1e-3)
    state = create_train_state(model16, optimizer, stack, fp, jax.random.PRNGKey(1))
    step = make_aif_train_step(model16, optimizer, task="D_FS")
    depth = jnp.ones((2, 1, 64, 64)) * 1.7
    aif = jnp.zeros((2, 3, 64, 64))
    losses0 = None
    for _ in range(5):
        state, losses = step(state, stack, fp, depth, aif)
        if losses0 is None:
            losses0 = float(losses["total"])
    assert np.isfinite(float(losses["total"]))
    assert float(losses["total"]) < losses0
    # params stayed f32 (mixed precision keeps master weights full-width)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == jnp.float32


def test_dfvnet_shapes():
    model = DFVNet(level=2, use_diff=1)
    stack = jnp.zeros((1, 4, 64, 64, 3))
    fd = jnp.linspace(0.5, 3.0, 4)[None]
    variables = model.init(jax.random.PRNGKey(0), stack, fd, train=True)
    (stacked, stds), _ = model.apply(
        variables, stack, fd, train=True, mutable=["batch_stats"]
    )
    assert len(stacked) == 2 and stacked[0].shape == (1, 1, 64, 64)
    pred, std, prob = model.apply(variables, stack, fd, train=False)
    assert pred.shape == (1, 1, 64, 64)
    assert prob.shape == (1, 4, 64, 64)
    np.testing.assert_allclose(np.asarray(prob.sum(axis=1)), 1.0, atol=1e-5)
    loss = dfv_loss(stacked, stds, jnp.ones((1, 1, 64, 64)),
                    jnp.ones((1, 1, 64, 64), bool))
    assert np.isfinite(float(loss))


# --------------------------------------------------------------------------
# Multi-device: same loss on 1-device and 8-device mesh
# --------------------------------------------------------------------------
def test_data_parallel_equivalence(aif_setup):
    import optax

    from aadff_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from aadff_tpu.train.trainer import create_train_state, make_aif_train_step

    model, _, _, _ = aif_setup
    B = 8
    rng = np.random.default_rng(3)
    stack = rng.uniform(0, 1, (B, 4, 64, 64, 3)).astype(np.float32)
    fp = np.broadcast_to(np.linspace(0.5, 3.0, 4, dtype=np.float32), (B, 4)).copy()
    depth = np.full((B, 1, 64, 64), 1.7, np.float32)
    aif = np.zeros((B, 3, 64, 64), np.float32)

    optimizer = optax.adam(1e-3)
    state0 = create_train_state(model, optimizer, jnp.asarray(stack[:1]),
                                jnp.asarray(fp[:1]), jax.random.PRNGKey(2))
    step = make_aif_train_step(model, optimizer, task="D_FS")

    # single device
    s1, losses1 = step(state0, jnp.asarray(stack), jnp.asarray(fp),
                       jnp.asarray(depth), jnp.asarray(aif))
    # 8-device mesh
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    state8 = replicate(mesh, create_train_state(
        model, optimizer, jnp.asarray(stack[:1]), jnp.asarray(fp[:1]),
        jax.random.PRNGKey(2)))
    batch = shard_batch(mesh, dict(stack=stack, fp=fp, depth=depth, aif=aif))
    s8, losses8 = step(state8, batch["stack"], batch["fp"], batch["depth"],
                       batch["aif"])
    assert abs(float(losses1["total"]) - float(losses8["total"])) < 1e-4


def test_dfv_data_parallel_equivalence():
    """Same DFV train-step loss on a 1-device and an 8-device mesh (the
    second model family exercised on the mesh like AiF's, reference
    2_aber_aware_dff_dfv.py:62)."""
    import optax

    from aadff_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from aadff_tpu.train.dff_dfv import make_dfv_train_step
    from aadff_tpu.train.trainer import create_train_state

    model = DFVNet(clean=False, level=2, use_diff=1)
    B = 8
    rng = np.random.default_rng(5)
    stack = rng.uniform(0, 1, (B, 4, 64, 64, 3)).astype(np.float32)
    fp = np.broadcast_to(np.linspace(0.5, 3.0, 4, dtype=np.float32), (B, 4)).copy()
    depth = np.full((B, 1, 64, 64), 1.7, np.float32)

    optimizer = optax.adam(1e-3)
    state0 = create_train_state(model, optimizer, jnp.asarray(stack[:1]),
                                jnp.asarray(fp[:1]), jax.random.PRNGKey(4))
    step = make_dfv_train_step(model, optimizer)

    s1, losses1 = step(state0, jnp.asarray(stack), jnp.asarray(fp),
                       jnp.asarray(depth))
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    state8 = replicate(mesh, create_train_state(
        model, optimizer, jnp.asarray(stack[:1]), jnp.asarray(fp[:1]),
        jax.random.PRNGKey(4)))
    batch = shard_batch(mesh, dict(stack=stack, fp=fp, depth=depth))
    s8, losses8 = step(state8, batch["stack"], batch["fp"], batch["depth"])
    assert abs(float(losses1["total"]) - float(losses8["total"])) < 1e-4


def test_dfv_train_step_nan_guard():
    """One NaN batch must leave DFV params, opt state, and BN running stats
    intact (same in-graph guard as the AiF step)."""
    import optax

    from aadff_tpu.train.dff_dfv import make_dfv_train_step
    from aadff_tpu.train.trainer import create_train_state

    model = DFVNet(clean=False, level=2, use_diff=1)
    stack = jnp.ones((1, 4, 64, 64, 3))
    fp = jnp.linspace(0.5, 3.0, 4)[None]
    optimizer = optax.adam(1e-3)
    state = create_train_state(model, optimizer, stack, fp, jax.random.PRNGKey(6))
    step = make_dfv_train_step(model, optimizer)
    depth = jnp.full((1, 1, 64, 64), 1.7)

    before = jax.tree.map(lambda x: np.asarray(x).copy(),
                          (state.params, state.batch_stats))
    bad_stack = jnp.full_like(stack, jnp.nan)
    state, losses = step(state, bad_stack, fp, depth)
    # skip is flagged and the reported loss is zeroed (epoch accumulators
    # on the host must stay finite)
    assert float(losses["skipped_nonfinite"]) == 1.0
    assert float(losses["total"]) == 0.0
    after = (state.params, state.batch_stats)
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, np.asarray(a))
    # and a sane batch afterwards still updates
    state2, losses2 = step(state, stack, fp, depth)
    assert float(losses2["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(losses2["total"]))
    assert any(
        not np.array_equal(b, np.asarray(a))
        for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(state2.params))
    )


def test_graft_entry_and_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (1, 1, 64, 64)
    ge.dryrun_multichip(8)
