"""Aberration-aware DFF training with DFVNet.

Counterpart of `2_aber_aware_dff_dfv.py` — with the reference's latent bugs
fixed instead of replicated (wrong config filename at :29, DataParallel wrap
of an unbound name at :62, undefined `aif_args` at :115; see SURVEY.md §2):
the intended behavior is the same training skeleton as the AiF script with
DFVNet(level=2, use_diff=1) and multi-scale masked L1.
"""
from __future__ import annotations

import functools
import logging
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..dff import NumpyLoader, select_focus_dist
from ..dff import metrics as M
from ..dff.factory import get_dataset, get_lens
from ..models.dfv import DFVNet, dfv_loss
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..utils.config import load_config
from ..utils.logging import set_logger, set_seed
from .trainer import (TrainState, create_train_state, guard_nonfinite,
                      render_focal_stack, save_checkpoint)


def config(path="configs/aber_aware_dff_dfv.yml"):
    args = load_config(path)
    args["num_devices"] = jax.device_count()
    result_dir = "./results/" + datetime.now().strftime("%m%d-%H%M%S") + "-AberAware_DFF_DFVNet"
    args["results_dir"] = result_dir
    os.makedirs(result_dir, exist_ok=True)
    set_logger(result_dir)
    set_seed(126)
    return args


def _dfv_step_body(model: DFVNet, optimizer):
    """Un-jitted single-step body shared by the per-step and the
    K-steps-per-dispatch train steps (the two must be the same program)."""
    def train_step(state: TrainState, stack, focus_dists, depth):
        def loss_fn(params):
            (stacked, stds), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                stack, focus_dists, train=True, mutable=["batch_stats"],
            )
            mask = depth > 0
            loss = dfv_loss(stacked, stds, depth, mask)
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # Same in-graph non-finite guard as the AiF step (trainer.py): one
        # NaN batch must leave params, opt_state, and BN stats untouched.
        ok = jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
        params = guard_nonfinite(ok, params, state.params)
        opt_state = guard_nonfinite(ok, opt_state, state.opt_state)
        new_bs = guard_nonfinite(ok, new_bs, state.batch_stats)
        # Same reporting contract as the AiF step: zeroed loss + an explicit
        # skip flag, so one NaN batch neither poisons the epoch accumulator
        # nor passes silently (train logs record the skip count).
        losses = {"total": jnp.where(ok, loss, 0.0),
                  "skipped_nonfinite": (~ok).astype(jnp.float32)}
        return TrainState(params=params, batch_stats=new_bs,
                          opt_state=opt_state, step=state.step + 1), losses

    return train_step


def make_dfv_train_step(model: DFVNet, optimizer):
    return jax.jit(_dfv_step_body(model, optimizer), donate_argnums=(0,))


def make_dfv_train_multi_step(model: DFVNet, optimizer, lens):
    """K DFV train steps (render included) in ONE device dispatch — same
    link-RTT amortization as trainer.make_aif_train_multi_step (see its
    docstring); inputs are K batches stacked on a leading axis and the
    returned `losses` entries have shape [K].  The non-finite guard stays
    per-step inside the scan."""
    body = _dfv_step_body(model, optimizer)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, aif_k, depth_k, fds_k):
        def scan_body(st, batch):
            aif, depth, fds = batch
            stack = render_focal_stack(lens, aif, depth, fds)
            st, losses = body(st, stack, fds, depth)
            return st, losses

        return jax.lax.scan(scan_body, state, (aif_k, depth_k, fds_k))

    return multi_step


def make_dfv_eval_step(model: DFVNet):
    @jax.jit
    def eval_step(state: TrainState, stack, focus_dists):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            stack, focus_dists, train=False,
        )

    return eval_step


def validate_dfv(eval_step, state, test_lens, val_loader, n_stack, epoch, args):
    sums = {k: 0.0 for k in ["abs_rel", "mse", "mae", "rmse", "acc1"]}
    n_val = 0
    for aif, gt_depth in val_loader:
        mask = gt_depth > 0
        focus_dists = select_focus_dist(gt_depth, n_stack, mode="linear")
        stack = render_focal_stack(test_lens, aif, gt_depth, focus_dists)
        pred, std, prob = eval_step(state, stack,
                                    jnp.asarray(focus_dists, jnp.float32))
        pd, gt, tm = np.squeeze(np.asarray(pred)), np.squeeze(gt_depth), np.squeeze(mask)
        sums["abs_rel"] += M.mask_abs_rel(pd, gt, tm)
        sums["mse"] += M.mask_mse(pd, gt, tm)
        sums["mae"] += M.mask_mae(pd, gt, tm)
        sums["rmse"] += M.mask_rmse(pd, gt, tm)
        sums["acc1"] += M.mask_accuracy_k(pd, gt, 1, tm)
        n_val += 1
    scores = {k: v / max(n_val, 1) for k, v in sums.items()}
    for k, v in scores.items():
        logging.info(f"Avg_{k}({epoch}): {v}")
    return scores


def train(args):
    mesh = make_mesh(min(jax.device_count(), args["bs"]))
    train_lens, test_lens = get_lens(args)
    n_stack = args["n_stack"]
    model = DFVNet(clean=False, level=2, use_diff=1)

    train_set, val_set = get_dataset(args)
    train_loader = NumpyLoader(train_set, batch_size=args["bs"], shuffle=True)
    val_loader = NumpyLoader(val_set, batch_size=1)

    # decay over optimizer STEPS, not images (see dff_aif.py — reference
    # cosine runs over len(train_loader) steps per epoch)
    steps = max(args["epochs"] * len(train_loader), 1)
    optimizer = optax.adam(
        optax.cosine_decay_schedule(float(args["lr"]), decay_steps=steps, alpha=0.0)
    )
    H, W = args["res"]
    sample_stack = jnp.zeros((1, n_stack, H, W, 3), jnp.float32)
    sample_fp = jnp.zeros((1, n_stack), jnp.float32)
    state = create_train_state(model, optimizer, sample_stack, sample_fp,
                               jax.random.PRNGKey(126))
    train_step = make_dfv_train_step(model, optimizer)
    eval_step = make_dfv_eval_step(model)
    state = replicate(mesh, state)

    args["mse_min"] = 100.0
    for epoch in range(args["epochs"] + 1):
        if epoch > 0:
            scores = validate_dfv(eval_step, state, test_lens, val_loader,
                                  n_stack, epoch, args)
            save_checkpoint(args["results_dir"], state, "last")
            if scores["mse"] < args["mse_min"]:
                args["mse_min"] = scores["mse"]
                save_checkpoint(args["results_dir"], state, "best")
        epoch_loss, n_batches = 0.0, 0
        for aif, depth in train_loader:
            if np.isnan(depth).any():
                continue
            focus_dists = select_focus_dist(depth, n_stack, mode="linear")
            stack = render_focal_stack(train_lens, aif, depth, focus_dists)
            batch = shard_batch(
                mesh,
                dict(stack=np.asarray(stack), fp=focus_dists.astype(np.float32),
                     depth=depth),
            )
            state, losses = train_step(state, batch["stack"], batch["fp"],
                                       batch["depth"])
            epoch_loss += float(losses["total"])
            n_batches += 1
        if n_batches:
            logging.info(f"epoch {epoch}: loss {epoch_loss / n_batches:.4f}")
    return state


def main():
    args = config()
    train(args)


if __name__ == "__main__":
    main()
