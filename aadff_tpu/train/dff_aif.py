"""Aberration-aware DFF training with AiFDepthNet.

TPU-native counterpart of `2_aber_aware_dff_aif.py`: same YAML schema, lens /
dataset factories, focal-stack rendering in the loop, per-epoch validation
with the full metric suite, last/best/best_acc1 checkpoints.
"""
from __future__ import annotations

import logging
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..dff import NumpyLoader, select_focus_dist
from ..dff.factory import get_dataset, get_lens
from ..models.aifnet import AiFDepthNet
from ..parallel.mesh import make_mesh, shard_batch, replicate
from ..utils.config import load_config
from ..utils.logging import set_logger, set_seed
from .trainer import (
    create_train_state,
    make_aif_eval_step,
    make_aif_train_step,
    render_focal_stack,
    save_checkpoint,
    validate,
)


def config(path="configs/aber_aware_dff_aif.yml"):
    args = load_config(path)
    args["num_devices"] = jax.device_count()
    result_dir = "./results/" + datetime.now().strftime("%m%d-%H%M%S") + "-AberAware_DFF_AiFNet"
    args["results_dir"] = result_dir
    os.makedirs(result_dir, exist_ok=True)
    set_logger(result_dir)
    logging.info(f"Using {args['num_devices']} devices")
    logging.info(f"Result folder: {result_dir}")
    set_seed(126)
    return args


def train(args):
    mesh = make_mesh(min(jax.device_count(), args["bs"]))
    train_lens, test_lens = get_lens(args)

    task = {"depth": "D_FS", "aif": "A_FS", "depth_aif": "DA_FS"}[args["pred_name"]]
    n_stack = args["n_stack"]
    # compute_dtype: bf16 runs the conv trunk in bfloat16 (params/losses f32;
    # the step is HBM-bound, docs/DESIGN.md §9). Default f32 = reference parity.
    model = AiFDepthNet(
        n_stack=n_stack,
        dtype=jnp.bfloat16 if args.get("compute_dtype") == "bf16" else None,
    )

    train_set, val_set = get_dataset(args)
    train_loader = NumpyLoader(train_set, batch_size=args["bs"], shuffle=True)
    val_loader = NumpyLoader(val_set, batch_size=1)
    logging.info(
        f"Totally {len(train_set)} images for training, {len(val_set)} for test."
    )

    # decay over optimizer STEPS (batches), not images — the reference's
    # cosine runs over len(train_loader) steps per epoch
    # (2_aber_aware_dff_aif.py:79-80); with bs=2 the image count would make
    # the schedule decay 2x too slowly
    steps = max(args["epochs"] * len(train_loader), 1)
    optimizer = optax.adam(
        optax.cosine_decay_schedule(float(args["lr"]), decay_steps=steps, alpha=0.0)
    )
    H, W = args["res"]
    sample_stack = jnp.zeros((1, n_stack, H, W, 3), jnp.float32)
    sample_fp = jnp.zeros((1, n_stack), jnp.float32)
    state = create_train_state(model, optimizer, sample_stack, sample_fp,
                               jax.random.PRNGKey(126))
    if args["train"].get("dffnet_pretrained"):
        from .trainer import load_checkpoint

        path = args["train"]["dffnet_pretrained"]
        if os.path.exists(path):
            state = load_checkpoint(os.path.dirname(path), state,
                                    name=os.path.basename(path)
                                    .replace("depth_net_", "")
                                    .replace(".msgpack", ""))
            logging.info(f"Loaded pretrained DFF net from {path}")

    train_step = make_aif_train_step(model, optimizer, task)
    eval_step = make_aif_eval_step(model)

    state = replicate(mesh, state)
    args["mse_min"] = 100.0
    args["acc1_max"] = 0.0

    for epoch in range(args["epochs"] + 1):
        if epoch > 0:
            scores = validate(eval_step, state, test_lens, val_loader, n_stack,
                              epoch, args)
            save_checkpoint(args["results_dir"], state, "last")
            if scores["mse"] < args["mse_min"]:
                args["mse_min"] = scores["mse"]
                save_checkpoint(args["results_dir"], state, "best")
            if scores["acc1"] > args["acc1_max"]:
                args["acc1_max"] = scores["acc1"]
                save_checkpoint(args["results_dir"], state, "best_acc1")

        epoch_loss, n_batches = 0.0, 0
        for aif, depth in train_loader:
            mask = depth > 0
            avg_depth = depth.sum(axis=(1, 2, 3)) / np.maximum(
                mask.sum(axis=(1, 2, 3)), 1
            )
            if np.isnan(avg_depth).any():
                continue
            focus_dists = select_focus_dist(depth, n_stack, mode="linear")
            stack = render_focal_stack(train_lens, aif, depth, focus_dists)

            batch = shard_batch(
                mesh,
                dict(
                    stack=np.asarray(stack), fp=focus_dists.astype(np.float32),
                    depth=depth, aif=aif,
                ),
            )
            state, losses = train_step(
                state, batch["stack"], batch["fp"], batch["depth"], batch["aif"]
            )
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
