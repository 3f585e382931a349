"""DFVNet end-to-end training integration on synthetic data (tiny shapes)."""
import numpy as np
import pytest


def test_dfv_training_end_to_end(tmp_path):
    import cv2 as cv
    import jax
    import jax.numpy as jnp
    import optax

    from aadff_tpu.dff import Middlebury, NumpyLoader, select_focus_dist
    from aadff_tpu.models.dfv import DFVNet
    from aadff_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from aadff_tpu.psfnet import ThinLens
    from aadff_tpu.train.dff_dfv import (
        make_dfv_eval_step,
        make_dfv_train_step,
        validate_dfv,
    )
    from aadff_tpu.train.trainer import create_train_state, render_focal_stack

    root = tmp_path / "mb"
    for scene in ["A-perfect", "B-perfect"]:
        d = root / scene
        d.mkdir(parents=True)
        rng = np.random.default_rng(hash(scene) % 997)
        cv.imwrite(str(d / "im0.png"),
                   rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8))
        cv.imwrite(str(d / "depth.png"),
                   rng.uniform(500, 3000, (64, 64)).astype(np.uint16))

    n_stack, H, W = 4, 64, 64
    lens = ThinLens(50.0, 1.8, 11, [25.968, 25.968], (H, W))
    dataset = Middlebury(str(root), resize=(H, W))
    loader = NumpyLoader(dataset, batch_size=2)

    model = DFVNet(clean=False, level=2, use_diff=1)
    optimizer = optax.adam(1e-4)
    state = create_train_state(model, optimizer,
                               jnp.zeros((1, n_stack, H, W, 3)),
                               jnp.zeros((1, n_stack)), jax.random.PRNGKey(0))
    train_step = make_dfv_train_step(model, optimizer)
    eval_step = make_dfv_eval_step(model)
    mesh = make_mesh(min(jax.device_count(), 2))
    state = replicate(mesh, state)

    for aif, depth in loader:
        fds = select_focus_dist(depth, n_stack, mode="linear")
        stack = render_focal_stack(lens, aif, depth, fds)
        batch = shard_batch(mesh, dict(stack=np.asarray(stack),
                                       fp=fds.astype(np.float32), depth=depth))
        state, losses = train_step(state, batch["stack"], batch["fp"],
                                   batch["depth"])
    assert np.isfinite(float(losses["total"]))
    assert float(losses["skipped_nonfinite"]) == 0.0

    args = {"results_dir": str(tmp_path)}
    scores = validate_dfv(eval_step, state, lens,
                          NumpyLoader(dataset, batch_size=1), n_stack, 1, args)
    for k in ["abs_rel", "mse", "acc1"]:
        assert np.isfinite(scores[k]), k
    # depth predictions are convex combinations of the focus distances
    assert 0 < scores["rmse"] < 10
