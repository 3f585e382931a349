"""Aberration-aware DFF training with DFVNet on SynthMiddlebury — chunked.

Companion to `3_aber_aware_dff_synth.py` for the second model family: the
reference's `2_aber_aware_dff_dfv.py` (with its latent bugs fixed — see
aadff_tpu/train/dff_dfv.py) trains DFVNet(level=2, use_diff=1) on aberrated
focal stacks rendered through the PSF surrogate in the loop and validates
with masked depth metrics.

Chunked execution for the tunnelled TPU (see .claude/skills/verify/SKILL.md):
each invocation trains `--epochs-per-chunk` epochs, checkpoints, and exits;
the persistent XLA compilation cache makes later chunks compile-free.

Artifacts under --workdir: depth_net_{state,best}.msgpack, train_log.jsonl,
metrics.jsonl (summarised in RESULTS_DFF.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from aadff_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np
import optax

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(REPO, "configs/aber_aware_dff_synth.yml"))
    ap.add_argument("--workdir", default=os.path.join(REPO, "results/dfv_synth"))
    ap.add_argument("--epochs-per-chunk", type=int, default=6)
    ap.add_argument("--total-epochs", type=int, default=20)
    ap.add_argument("--k-per-dispatch", type=int, default=0,
                    help="group K train steps (render included) into one "
                         "jitted lax.scan dispatch so the ~25 ms link RTT "
                         "and per-step host syncs amortize K-fold (0 = one "
                         "dispatch per step, the reference-shaped loop)")
    ap.add_argument("--time-budget", type=float, default=600.0,
                    help="stop cleanly after the first epoch that ends past "
                         "this many seconds (a SIGTERM kill can wedge the "
                         "TPU relay; clean exits don't)")
    ap.add_argument("--eval-only", default=None, metavar="CKPT_NAME",
                    help="skip training; validate checkpoint "
                         "depth_net_<CKPT_NAME>.msgpack, save depth maps, exit")
    ap.add_argument("--lr", type=float, default=None,
                    help="override the config peak learning rate (recipe "
                         "sweeps; the cosine still decays over total-epochs)")
    ap.add_argument("--val-dir", default=None,
                    help="override the validation scene dir (e.g. the "
                         "held-out test split datasets/SynthMiddlebury/test)")
    args_cli = ap.parse_args()
    t_start = time.time()

    from aadff_tpu.dff import NumpyLoader, select_focus_dist
    from aadff_tpu.dff.factory import get_dataset, get_lens
    from aadff_tpu.models.dfv import DFVNet
    from aadff_tpu.train.dff_dfv import (
        make_dfv_eval_step,
        make_dfv_train_multi_step,
        make_dfv_train_step,
        validate_dfv,
    )
    from aadff_tpu.train.trainer import (
        create_train_state,
        load_checkpoint,
        render_focal_stack,
        save_checkpoint,
    )
    from aadff_tpu.utils.config import load_config
    from aadff_tpu.utils.logging import set_seed

    os.makedirs(args_cli.workdir, exist_ok=True)
    args = load_config(args_cli.config)
    args["results_dir"] = args_cli.workdir
    if args_cli.val_dir:
        args["SynthMiddlebury_val"] = args_cli.val_dir
    if args_cli.lr is not None:
        args["lr"] = args_cli.lr
    set_seed(126)

    progress_path = os.path.join(args_cli.workdir, "progress.json")
    progress = {"epoch": 0, "mse_min": 1e9}
    if os.path.exists(progress_path):
        with open(progress_path) as f:
            progress = json.load(f)
    start_epoch = progress["epoch"]
    if args_cli.eval_only is None and start_epoch >= args_cli.total_epochs:
        print(f"training complete at epoch {start_epoch}")
        return

    train_lens, test_lens = get_lens(args)
    n_stack = args["n_stack"]
    model = DFVNet(clean=False, level=2, use_diff=1)

    train_set, val_set = get_dataset(args)
    train_loader = NumpyLoader(train_set, batch_size=args["bs"], shuffle=True,
                               seed=126 + start_epoch)
    val_loader = NumpyLoader(val_set, batch_size=1)

    steps_per_epoch = len(train_loader)
    total_steps = max(args_cli.total_epochs * steps_per_epoch, 1)
    optimizer = optax.adam(
        optax.cosine_decay_schedule(float(args["lr"]), decay_steps=total_steps,
                                    alpha=0.0)
    )
    H, W = args["res"]
    state = create_train_state(
        model, optimizer, jnp.zeros((1, n_stack, H, W, 3), jnp.float32),
        jnp.zeros((1, n_stack), jnp.float32), jax.random.PRNGKey(126),
    )
    if start_epoch > 0:
        state = load_checkpoint(args_cli.workdir, state, name="state")
        print(f"resumed from epoch {start_epoch} (step {int(state.step)})")

    train_step = make_dfv_train_step(model, optimizer)
    multi_step = (make_dfv_train_multi_step(model, optimizer, train_lens)
                  if args_cli.k_per_dispatch > 1 else None)
    eval_step = make_dfv_eval_step(model)

    if args_cli.eval_only is not None:
        from aadff_tpu.dff import metrics as M
        from aadff_tpu.train.trainer import render_focal_stack as _rfs
        from aadff_tpu.utils.image import imwrite_colormap

        state = load_checkpoint(args_cli.workdir, state, name=args_cli.eval_only)
        img_dir = os.path.join(args_cli.workdir, "results")
        os.makedirs(img_dir, exist_ok=True)
        scores, n_val = {"abs_rel": 0.0, "mse": 0.0, "rmse": 0.0, "acc1": 0.0}, 0
        for idx, (aif, gt_depth) in enumerate(val_loader):
            fds = select_focus_dist(gt_depth, n_stack, mode="linear")
            stack = _rfs(test_lens, aif, gt_depth, fds)
            pred, std, prob = eval_step(state, stack, jnp.asarray(fds, jnp.float32))
            pd = np.squeeze(np.asarray(pred))
            gt, tm = np.squeeze(gt_depth), np.squeeze(gt_depth > 0)
            scores["abs_rel"] += M.mask_abs_rel(pd, gt, tm)
            scores["mse"] += M.mask_mse(pd, gt, tm)
            scores["rmse"] += M.mask_rmse(pd, gt, tm)
            scores["acc1"] += M.mask_accuracy_k(pd, gt, 1, tm)
            n_val += 1
            imwrite_colormap(f"{img_dir}/img{idx}_pred.png", pd, vmax=gt.max())
            imwrite_colormap(f"{img_dir}/img{idx}_gt.png", gt)
        scores = {k: float(v / max(n_val, 1)) for k, v in scores.items()}
        scores["ckpt"] = args_cli.eval_only
        with open(os.path.join(args_cli.workdir, "eval_final.json"), "w") as f:
            json.dump(scores, f, indent=2)
        print("eval:", json.dumps({k: round(v, 4) if isinstance(v, float) else v
                                   for k, v in scores.items()}))
        return

    end_epoch = min(start_epoch + args_cli.epochs_per_chunk,
                    args_cli.total_epochs)
    budget_anchored = False
    K = args_cli.k_per_dispatch
    for epoch in range(start_epoch, end_epoch):
        t0 = time.time()
        epoch_loss, n_batches, n_skipped = 0.0, 0, 0
        pending = []  # staged (aif, depth, fds) batches for the K-step path
        deferred_losses = []  # K-path loss arrays, synced at epoch end
        for aif, depth in train_loader:
            if np.isnan(depth).any():
                continue
            focus_dists = select_focus_dist(depth, n_stack, mode="linear")
            if multi_step is not None:
                pending.append((aif, depth,
                                np.asarray(focus_dists, np.float32)))
                if len(pending) < K:
                    continue
                state, losses = multi_step(
                    state,
                    jnp.asarray(np.stack([p[0] for p in pending])),
                    jnp.asarray(np.stack([p[1] for p in pending])),
                    jnp.asarray(np.stack([p[2] for p in pending])),
                )
                pending = []
                # defer the host sync (see 3_aber_aware_dff_synth.py): the
                # next group's assembly/upload overlaps the in-flight dispatch
                deferred_losses.append(losses)
                n_batches += K
                if not budget_anchored:
                    jax.block_until_ready(losses["total"])
            else:
                stack = render_focal_stack(train_lens, aif, depth, focus_dists)
                state, losses = train_step(
                    state, stack, jnp.asarray(focus_dists, jnp.float32),
                    jnp.asarray(depth),
                )
                epoch_loss += float(losses["total"])
                n_skipped += int(losses["skipped_nonfinite"])
                n_batches += 1
            if not budget_anchored:
                # the sync above means the backend is live only now —
                # re-anchor the budget clock so a relay startup wedge
                # (6-18 min pre-dispatch futex, verify SKILL.md) doesn't
                # consume the whole training budget
                budget_anchored, t_start = True, time.time()
        # tail of the epoch (< K staged batches): one dispatch per step
        for aif, depth, focus_dists in pending:
            stack = render_focal_stack(train_lens, aif, depth, focus_dists)
            state, losses = train_step(
                state, stack, jnp.asarray(focus_dists, jnp.float32),
                jnp.asarray(depth),
            )
            epoch_loss += float(losses["total"])
            n_skipped += int(losses["skipped_nonfinite"])
            n_batches += 1
        for losses in deferred_losses:
            epoch_loss += float(jnp.sum(losses["total"]))
            n_skipped += int(jnp.sum(losses["skipped_nonfinite"]))
        rec = {"epoch": epoch + 1,
               "loss": round(epoch_loss / max(n_batches, 1), 5),
               "steps": n_batches, "skipped": n_skipped,
               "sec": round(time.time() - t0, 1)}
        print("train:", json.dumps(rec))
        with open(os.path.join(args_cli.workdir, "train_log.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

        save_checkpoint(args_cli.workdir, state, "state")
        progress["epoch"] = epoch + 1
        # persist progress immediately: a kill during validation must not
        # cause the completed epoch to be re-trained
        with open(progress_path, "w") as f:
            json.dump(progress, f)

        scores = validate_dfv(eval_step, state, test_lens, val_loader,
                              n_stack, epoch + 1, args)
        scores = {k: float(v) for k, v in scores.items()}
        scores["epoch"] = epoch + 1
        with open(os.path.join(args_cli.workdir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(scores) + "\n")
        print("val:", json.dumps({k: round(v, 4) for k, v in scores.items()}))
        if scores["mse"] < progress["mse_min"]:
            progress["mse_min"] = scores["mse"]
            save_checkpoint(args_cli.workdir, state, "best")

        with open(progress_path, "w") as f:
            json.dump(progress, f)

        if time.time() - t_start > args_cli.time_budget:
            print(f"time budget reached after epoch {epoch + 1}; exiting cleanly")
            break

    print(f"chunk done: epochs {start_epoch + 1}..{end_epoch} / {args_cli.total_epochs}")


if __name__ == "__main__":
    main()
