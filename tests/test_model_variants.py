"""Model variants: DFV level/use_diff combos, AiFNet 4-channel and DIRECT
stage-2, thinlens factory branch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dfv_level1_fv_mode():
    """Ours-FV (use_diff=0) at level=1 (reference DFFNet.py:24, 69-70)."""
    from aadff_tpu.models.dfv import DFVNet

    model = DFVNet(level=1, use_diff=0)
    stack = jnp.zeros((1, 4, 64, 64, 3))
    fd = jnp.linspace(0.5, 3.0, 4)[None]
    variables = model.init(jax.random.PRNGKey(0), stack, fd, train=True)
    pred, std, prob = model.apply(variables, stack, fd, train=False)
    assert pred.shape == (1, 1, 64, 64)
    np.testing.assert_allclose(np.asarray(prob.sum(1)), 1.0, atol=1e-5)


def test_aifnet_four_channel_input():
    from aadff_tpu.models.aifnet import AiFDepthNet, add_stack_index_channel

    stack = jnp.ones((2, 4, 64, 64, 3))
    stack4 = add_stack_index_channel(stack)
    assert stack4.shape == (2, 4, 64, 64, 4)
    np.testing.assert_allclose(np.asarray(stack4[0, 0, 0, 0, 3]), 0.25)
    np.testing.assert_allclose(np.asarray(stack4[0, 3, 0, 0, 3]), 1.0)

    model = AiFDepthNet(n_channels=4, n_stack=4)
    fp = jnp.linspace(0.5, 3.0, 4)[None].repeat(2, 0)
    variables = model.init(jax.random.PRNGKey(0), stack4, fp)
    out = model.apply(variables, stack4, fp)
    assert out["pred_depth"].shape == (2, 1, 64, 64)


def test_aifnet_direct_stage2():
    from aadff_tpu.models.aifnet import AiFDepthNet

    model = AiFDepthNet(n_stack=4, stage2="direct")
    stack = jnp.zeros((1, 4, 64, 64, 3))
    fp = jnp.linspace(0.5, 3.0, 4)[None]
    variables = model.init(jax.random.PRNGKey(0), stack, fp)
    out = model.apply(variables, stack, fp)
    assert out["pred_depth"].shape == (1, 1, 64, 64)
    assert out["pred_AiF_img"].shape == (1, 3, 64, 64)


def test_factory_thinlens_branch():
    from aadff_tpu.dff.factory import get_lens
    from aadff_tpu.psfnet import ThinLens

    args = {
        "ks": 11, "res": (64, 64),
        "train": {"lens": "thinlens", "foc_len": 50.0, "fnum": 1.8,
                  "sensor_size": ["25.968", "25.968"]},
        "test": {"lens": "thinlens", "foc_len": 50.0, "fnum": 1.8,
                 "sensor_size": ["25.968", "25.968"]},
    }
    train_lens, test_lens = get_lens(args)
    assert isinstance(train_lens, ThinLens) and isinstance(test_lens, ThinLens)
    img = np.zeros((1, 3, 64, 64), np.float32)
    depth = -np.full((1, 1, 64, 64), 2400.0, np.float32)
    out = np.asarray(train_lens.render(img + 0.5, depth, np.asarray([-2400.0])))
    assert out.shape == img.shape and np.isfinite(out).all()


def test_aifnet_remat_matches_plain():
    """remat=True trades memory for FLOPs without changing the math."""
    import optax

    from aadff_tpu.models.aifnet import AiFDepthNet

    stack = jnp.ones((1, 4, 64, 64, 3)) * 0.3
    fp = jnp.linspace(0.5, 3.0, 4)[None]
    plain = AiFDepthNet(n_stack=4)
    variables = plain.init(jax.random.PRNGKey(0), stack, fp)
    a = plain.apply(variables, stack, fp)
    remat = AiFDepthNet(n_stack=4, remat=True)
    b = remat.apply(variables, stack, fp)
    np.testing.assert_allclose(np.asarray(a["pred_depth"]),
                               np.asarray(b["pred_depth"]), atol=1e-6)
