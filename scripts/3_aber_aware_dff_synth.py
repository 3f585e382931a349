"""Aberration-aware DFF training on SynthMiddlebury — chunked for the TPU.

The round-1 gap (VERDICT.md #1): the machinery existed but no DFF network had
ever been trained to a depth-metric result.  This script runs the reference's
training loop (`2_aber_aware_dff_aif.py:53-244`: render aberrated focal stacks
through the PSF surrogate in the loop, AiFDepthNet forward/backward, per-epoch
validation with the full metric suite + best checkpoints) on the synthetic-
texture Middlebury set built by `make_synth_dataset.py`.

Chunked execution: the tunnelled TPU wedges after ~12-14 min per process, so
each invocation trains `--epochs-per-chunk` epochs and exits; training state
(params + opt state + step) warm-starts from the checkpoint.  A persistent
XLA compilation cache makes the recompiles across chunks cheap.

Artifacts (all under --workdir, committed summaries in RESULTS_DFF.md):
  state.msgpack / best.msgpack  - full TrainState checkpoints
  train_log.jsonl               - per-epoch mean loss
  metrics.jsonl                 - per-epoch validation metric suite
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np
import optax

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(REPO, "configs/aber_aware_dff_synth.yml"))
    ap.add_argument("--workdir", default=os.path.join(REPO, "results/dff_synth"))
    ap.add_argument("--epochs-per-chunk", type=int, default=3)
    ap.add_argument("--total-epochs", type=int, default=20)
    ap.add_argument("--validate-every", type=int, default=1)
    ap.add_argument("--save-images", action="store_true")
    ap.add_argument("--eval-only", default=None, metavar="CKPT_NAME",
                    help="skip training; validate checkpoint "
                         "depth_net_<CKPT_NAME>.msgpack and exit")
    ap.add_argument("--val-dir", default=None,
                    help="override the validation scene dir (e.g. the "
                         "held-out test split datasets/SynthMiddlebury/test)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override the config peak learning rate (recipe "
                         "sweeps; the cosine still decays over total-epochs)")
    ap.add_argument("--bf16", action="store_true",
                    help="run the conv trunk in bfloat16 (params/optimizer/"
                         "losses stay f32) — the step is HBM-bound, see "
                         "docs/DESIGN.md §9")
    ap.add_argument("--save-every", type=int, default=1,
                    help="save the full train state every N epochs (it is "
                         "~200 MB across the tunnel, ~15 s; progress.json "
                         "advances only with a save, so a kill retrains at "
                         "most N-1 epochs)")
    ap.add_argument("--k-per-dispatch", type=int, default=0,
                    help="group K train steps (render included) into one "
                         "jitted lax.scan dispatch so the ~25 ms link RTT "
                         "and per-step host syncs amortize K-fold (0 = one "
                         "dispatch per step, the reference-shaped loop)")
    ap.add_argument("--time-budget", type=float, default=600.0,
                    help="stop cleanly after the first epoch that ends past "
                         "this many seconds (a SIGTERM kill can wedge the "
                         "TPU relay; clean exits don't)")
    args_cli = ap.parse_args()
    t_start = time.time()

    from aadff_tpu.dff import NumpyLoader, select_focus_dist
    from aadff_tpu.dff.factory import get_dataset, get_lens
    from aadff_tpu.models.aifnet import AiFDepthNet
    from aadff_tpu.utils.config import load_config
    from aadff_tpu.utils.logging import set_seed
    from aadff_tpu.train.trainer import (
        create_train_state,
        load_checkpoint,
        make_aif_eval_step,
        make_aif_train_multi_step,
        make_aif_train_step,
        render_focal_stack,
        save_checkpoint,
        validate,
    )

    os.makedirs(args_cli.workdir, exist_ok=True)
    args = load_config(args_cli.config)
    args["results_dir"] = args_cli.workdir
    if args_cli.val_dir:
        args["SynthMiddlebury_val"] = args_cli.val_dir
    if args_cli.lr is not None:
        args["lr"] = args_cli.lr
    set_seed(126)

    progress_path = os.path.join(args_cli.workdir, "progress.json")
    progress = {"epoch": 0, "mse_min": 1e9, "acc1_max": 0.0}
    if os.path.exists(progress_path):
        with open(progress_path) as f:
            progress = json.load(f)
    start_epoch = progress["epoch"]
    if args_cli.eval_only is None and start_epoch >= args_cli.total_epochs:
        print(f"training complete at epoch {start_epoch}")
        return

    train_lens, test_lens = get_lens(args)
    task = {"depth": "D_FS", "aif": "A_FS", "depth_aif": "DA_FS"}[args["pred_name"]]
    n_stack = args["n_stack"]
    model = AiFDepthNet(n_stack=n_stack,
                        dtype=jnp.bfloat16 if args_cli.bf16 else None)

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

    train_step = make_aif_train_step(model, optimizer, task)
    multi_step = (make_aif_train_multi_step(model, optimizer, task, train_lens)
                  if args_cli.k_per_dispatch > 1 else None)
    eval_step = make_aif_eval_step(model)

    if args_cli.eval_only is not None:
        state = load_checkpoint(args_cli.workdir, state, name=args_cli.eval_only)
        scores = validate(eval_step, state, test_lens, val_loader, n_stack,
                          start_epoch, args, save_images=True)
        scores = {k: float(v) for k, v in scores.items()}
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
            mask = depth > 0
            avg_depth = depth.sum(axis=(1, 2, 3)) / np.maximum(
                mask.sum(axis=(1, 2, 3)), 1)
            if np.isnan(avg_depth).any():
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
                # defer the host sync: keep the per-group losses as device
                # arrays so assembling + uploading the NEXT group overlaps
                # the in-flight dispatch instead of blocking on it
                deferred_losses.append(losses)
                n_batches += K
                if not budget_anchored:
                    jax.block_until_ready(losses["total"])
            else:
                stack = render_focal_stack(train_lens, aif, depth, focus_dists)
                state, losses = train_step(
                    state, stack, jnp.asarray(focus_dists, jnp.float32),
                    jnp.asarray(depth), jnp.asarray(aif),
                )
                epoch_loss += float(losses["total"])
                n_skipped += int(losses["skipped_nonfinite"])
                n_batches += 1
            if not budget_anchored:
                # the float() above synced the first step, so the backend is
                # live only now — re-anchor the budget clock so a relay
                # startup wedge (6-18 min of pre-dispatch futex, verify
                # SKILL.md) doesn't consume the whole training budget
                budget_anchored, t_start = True, time.time()
        # tail of the epoch (< K staged batches): one dispatch per step so
        # every loaded batch still trains and step counts stay loader-exact
        for aif, depth, focus_dists in pending:
            stack = render_focal_stack(train_lens, aif, depth, focus_dists)
            state, losses = train_step(
                state, stack, jnp.asarray(focus_dists, jnp.float32),
                jnp.asarray(depth), jnp.asarray(aif),
            )
            epoch_loss += float(losses["total"])
            n_skipped += int(losses["skipped_nonfinite"])
            n_batches += 1
        for losses in deferred_losses:
            epoch_loss += float(jnp.sum(losses["total"]))
            n_skipped += int(jnp.sum(losses["skipped_nonfinite"]))
        mean_loss = epoch_loss / max(n_batches, 1)
        rec = {"epoch": epoch + 1, "loss": round(mean_loss, 5),
               "steps": n_batches, "skipped": n_skipped,
               "sec": round(time.time() - t0, 1)}
        print("train:", json.dumps(rec))
        with open(os.path.join(args_cli.workdir, "train_log.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

        # The full train state is ~200 MB and must cross the tunnel on save
        # (~15 s measured), so --save-every thins the cadence; progress.json
        # only advances WITH a saved checkpoint, so a kill between saves
        # retrains at most save_every-1 epochs instead of resuming into a
        # state file that does not exist.
        def _persist():
            save_checkpoint(args_cli.workdir, state, "state")
            progress["epoch"] = epoch + 1
            with open(progress_path, "w") as f:
                json.dump(progress, f)

        saved = False
        if (epoch + 1) % args_cli.save_every == 0 or epoch + 1 == end_epoch:
            _persist()
            saved = True

        if (epoch + 1) % args_cli.validate_every == 0 or epoch + 1 == args_cli.total_epochs:
            scores = validate(eval_step, state, test_lens, val_loader, n_stack,
                              epoch + 1, args, save_images=args_cli.save_images)
            scores = {k: float(v) for k, v in scores.items()}
            scores["epoch"] = epoch + 1
            with open(os.path.join(args_cli.workdir, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(scores) + "\n")
            print("val:", json.dumps({k: round(v, 4) for k, v in scores.items()}))
            if scores["mse"] < progress["mse_min"]:
                progress["mse_min"] = scores["mse"]
                save_checkpoint(args_cli.workdir, state, "best")
            if scores["acc1"] > progress["acc1_max"]:
                progress["acc1_max"] = scores["acc1"]
                save_checkpoint(args_cli.workdir, state, "best_acc1")

        with open(progress_path, "w") as f:
            json.dump(progress, f)

        if time.time() - t_start > args_cli.time_budget:
            if not saved:
                _persist()
            print(f"time budget reached after epoch {epoch + 1}; exiting cleanly")
            break

    print(f"chunk done: epochs {start_epoch + 1}..{end_epoch} / {args_cli.total_epochs}")


if __name__ == "__main__":
    main()
