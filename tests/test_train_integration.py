"""End-to-end DFF training integration on synthetic data (tiny shapes):
factory -> render stack -> sharded train step -> validate -> checkpoints.
Mirrors the reference 2_aber_aware_dff_aif.py flow (SURVEY.md §3.3)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_middlebury(tmp_path_factory):
    import cv2 as cv

    root = tmp_path_factory.mktemp("mb2014")
    for scene in ["A-perfect", "B-perfect"]:
        d = root / scene
        d.mkdir()
        rng = np.random.default_rng(hash(scene) % 997)
        cv.imwrite(str(d / "im0.png"),
                   rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8))
        cv.imwrite(str(d / "depth.png"),
                   rng.uniform(500, 3000, (64, 64)).astype(np.uint16))
    return str(root)


def test_dff_aif_training_end_to_end(synthetic_middlebury, tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from aadff_tpu.dff import Middlebury, NumpyLoader, select_focus_dist
    from aadff_tpu.models.aifnet import AiFDepthNet
    from aadff_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from aadff_tpu.psfnet import ThinLens
    from aadff_tpu.train.trainer import (
        create_train_state,
        load_checkpoint,
        make_aif_eval_step,
        make_aif_train_step,
        render_focal_stack,
        save_checkpoint,
        validate,
    )

    n_stack = 4
    H = W = 64
    lens = ThinLens(50.0, 1.8, 11, [25.968, 25.968], (H, W))
    dataset = Middlebury(synthetic_middlebury, resize=(H, W))
    loader = NumpyLoader(dataset, batch_size=2)

    model = AiFDepthNet(n_stack=n_stack)
    optimizer = optax.adam(1e-4)
    state = create_train_state(
        model, optimizer, jnp.zeros((1, n_stack, H, W, 3)),
        jnp.zeros((1, n_stack)), jax.random.PRNGKey(0),
    )
    train_step = make_aif_train_step(model, optimizer, task="D_FS")
    eval_step = make_aif_eval_step(model)
    mesh = make_mesh(min(jax.device_count(), 2))
    state = replicate(mesh, state)

    # one training epoch on the synthetic set
    for aif, depth in loader:
        fds = select_focus_dist(depth, n_stack, mode="linear")
        stack = render_focal_stack(lens, aif, depth, fds)
        batch = shard_batch(mesh, dict(stack=np.asarray(stack),
                                       fp=fds.astype(np.float32),
                                       depth=depth, aif=aif))
        state, losses = train_step(state, batch["stack"], batch["fp"],
                                   batch["depth"], batch["aif"])
    assert np.isfinite(float(losses["total"]))
    assert int(state.step) == 1  # 2 scenes / bs 2 = 1 step

    # validation pass with full metric suite + image artifacts
    args = {"results_dir": str(tmp_path)}
    val_loader = NumpyLoader(dataset, batch_size=1)
    scores = validate(eval_step, state, lens, val_loader, n_stack, epoch=1,
                      args=args)
    for k in ["abs_rel", "rmse", "acc1", "psnr", "ssim", "avg_time"]:
        assert k in scores and np.isfinite(scores[k]), k
    assert os.path.exists(tmp_path / "results" / "img0_pred.png")

    # checkpoint roundtrip
    save_checkpoint(str(tmp_path), state, "last")
    restored = load_checkpoint(str(tmp_path), state, "last")
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
