"""DFF training engine: pjit data-parallel train/eval steps + checkpoints.

TPU-native counterpart of the reference training scripts
(`2_aber_aware_dff_aif.py` / `2_aber_aware_dff_dfv.py`): the reference wraps
the model in `nn.DataParallel` (line 67) and loops frames on one host; here
the batch is sharded over a `jax.sharding.Mesh` and the whole
render->forward->backward step is one jitted program (XLA inserts the gradient
all-reduce over ICI).

Adds what the reference lacks (SURVEY.md §5): full train-state checkpointing
(params + optimizer + step) with Orbax for resume.
"""
from __future__ import annotations

import functools
import logging
import os
import time
from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..dff import metrics as M
from ..dff.focus import select_focus_dist
from ..models.aifnet import AiFDepthNet, compute_loss
from ..utils.image import imwrite_colormap


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, optimizer, sample_stack, sample_fp, rng):
    # jit the init: eager init would compile every conv op separately, which
    # is pathological through a remote-TPU tunnel (~minutes of op-by-op
    # compiles); one jitted program compiles once and caches persistently.
    init_fn = jax.jit(lambda r, s, f: model.init(r, s, f, train=True))
    variables = init_fn(rng, sample_stack, sample_fp)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def guard_nonfinite(ok, new_tree, old_tree):
    """In-graph failure detection: keep `new_tree` only when `ok` (scalar
    bool).  Non-array leaves (e.g. schedule callables inside opt_state) pass
    through unchanged.  Shared by the AiF and DFV train steps so one NaN
    batch can never poison params, optimizer state, or BN running stats."""
    return jax.tree.map(
        lambda new, old: jnp.where(ok, new, old) if hasattr(new, "shape")
        else new, new_tree, old_tree,
    )


def _aif_step_body(model: AiFDepthNet, optimizer, task: str,
                   disp_w=1.0, aif_w=0.0, smooth_w=0.0):
    """Un-jitted single-step body shared by the per-step and the
    K-steps-per-dispatch train steps (the two must be the same program)."""
    def train_step(state: TrainState, stack, focus_dists, depth, aif):
        """stack: [B, S, H, W, C]; depth/aif in NCHW like the reference."""

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                stack, focus_dists, train=True, mutable=["batch_stats"],
            )
            losses = compute_loss(
                out, {"depth": depth, "AiF_img": aif}, task,
                disp_w=disp_w, aif_w=aif_w, smooth_w=smooth_w,
            )
            return losses["total"], (losses, updates["batch_stats"])

        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # Failure detection: skip the update on non-finite loss/grads (the
        # reference skips NaN batches on host, 2_aber_aware_dff_aif.py:103-105;
        # here the guard is in-graph so the jitted step never poisons params)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        params = guard_nonfinite(ok, params, state.params)
        opt_state = guard_nonfinite(ok, opt_state, state.opt_state)
        # batch_stats too: a poisoned forward pass would otherwise bake NaNs
        # into BN running stats (momentum average with NaN stays NaN forever).
        new_bs = guard_nonfinite(ok, new_bs, state.batch_stats)
        # Reported losses are zeroed on a skipped batch — otherwise one NaN
        # loss still poisons the host-side epoch accumulator even though the
        # state was protected (the skip stays visible via the counter below).
        losses = jax.tree.map(lambda v: jnp.where(ok, v, 0.0), losses)
        losses["skipped_nonfinite"] = (~ok).astype(jnp.float32)

        new_state = TrainState(
            params=params, batch_stats=new_bs, opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, losses

    return train_step


def make_aif_train_step(model: AiFDepthNet, optimizer, task: str,
                        disp_w=1.0, aif_w=0.0, smooth_w=0.0):
    body = _aif_step_body(model, optimizer, task, disp_w, aif_w, smooth_w)
    return jax.jit(body, donate_argnums=(0,))


def make_aif_train_multi_step(model: AiFDepthNet, optimizer, task: str, lens,
                              disp_w=1.0, aif_w=0.0, smooth_w=0.0):
    """K train steps (render included) in ONE device dispatch.

    Real campaigns on this tunnelled chip run ~0.7-0.9 wall steps/s against
    2.02 device steps/s: each step pays a render dispatch, a train-step
    dispatch, and a host loss sync over a ~25 ms-RTT link.  Scanning K
    pre-staged batches inside one jitted program amortizes that fixed cost
    K-fold — the same structural trick scripts/profile_train_step.py uses to
    measure the pure device rate (reference epoch loop:
    /root/reference/2_aber_aware_dff_aif.py:95-126, which has no such
    overhead to hide because its accelerator is host-local).

    Takes K batches stacked on a leading axis: aif [K,B,C,H,W],
    depth [K,B,1,H,W], focus_dists [K,B,S].  Returns the advanced state and
    per-step `losses` stacked to shape [K] per entry, so epoch accumulators
    see exactly what K individual dispatches would have reported.  The
    non-finite guard stays per-step (a NaN batch inside the group skips only
    its own update).  `lens` is closed over: its PSF-surrogate weights are
    baked into the executable once instead of re-uploaded per call.
    """
    body = _aif_step_body(model, optimizer, task, disp_w, aif_w, smooth_w)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, aif_k, depth_k, fds_k):
        def scan_body(st, batch):
            aif, depth, fds = batch
            stack = render_focal_stack(lens, aif, depth, fds)
            st, losses = body(st, stack, fds, depth, aif)
            return st, losses

        return jax.lax.scan(scan_body, state, (aif_k, depth_k, fds_k))

    return multi_step


def make_aif_eval_step(model: AiFDepthNet):
    @jax.jit
    def eval_step(state: TrainState, stack, focus_dists):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            stack, focus_dists, train=False,
        )

    return eval_step


def render_focal_stack(lens, aif, depth, focus_dists):
    """Render an aberrated focal stack (reference 2_aber_aware_dff_aif.py:107-116).

    aif: [B, C, H, W]; depth: [B, 1, H, W] in m (>0); focus_dists: [B, S] in m.
    Returns [B, S, H, W, C] (channels-last for the models).
    """
    depth_mm = jnp.asarray(depth, jnp.float32) * -1e3
    fds_mm = jnp.asarray(focus_dists, jnp.float32) * -1e3
    if hasattr(lens, "render_stack"):
        # device-resident unit conversion: sharded inputs stay sharded, so the
        # render itself runs data-parallel over the mesh (no host round-trip)
        stack = lens.render_stack(aif, depth_mm, fds_mm)  # [B, S, C, H, W]
    else:
        frames = []
        S = focus_dists.shape[1]
        for i in range(S):
            img = lens.render(aif, depth_mm, fds_mm[:, i])
            frames.append(img)
        stack = jnp.stack(frames, axis=1)  # [B, S, C, H, W]
    return jnp.transpose(stack, (0, 1, 3, 4, 2))


# --------------------------------------------------------------------------
# Validation (reference 2_aber_aware_dff_aif.py:129-244)
# --------------------------------------------------------------------------
def validate(eval_step, state, test_lens, val_loader, n_stack, epoch, args,
             save_images=True):
    result_img_dir = os.path.join(args["results_dir"], "results")
    os.makedirs(result_img_dir, exist_ok=True)

    # LPIPS is a first-class quality metric in the reference
    # (deeplens/utils.py:15-45) but needs pretrained VGG weights; emit it
    # when a converted weights file exists, skip it cleanly otherwise.
    from ..utils.quality import batch_LPIPS, lpips_available

    use_lpips = lpips_available(native_only=True)

    sums = {k: 0.0 for k in [
        "abs_rel", "sq_rel", "mse", "mae", "rmse", "rmse_log",
        "acc1", "acc2", "acc3", "psnr", "ssim"]
        + (["lpips"] if use_lpips else [])}
    n_val = 0
    val_time = 0.0

    for idx, (aif, gt_depth) in enumerate(val_loader):
        mask = gt_depth > 0
        avg_depth = gt_depth.sum() / max(mask.sum(), 1)
        if np.isnan(avg_depth):
            continue
        focus_dists = select_focus_dist(gt_depth, n_stack, mode="linear")
        stack = render_focal_stack(test_lens, aif, gt_depth, focus_dists)

        t0 = time.time()
        out = eval_step(state, stack, jnp.asarray(focus_dists, jnp.float32))
        pred_depth = np.asarray(out["pred_depth"])
        pred_aif = np.asarray(out["pred_AiF_img"])
        val_time += time.time() - t0

        tm = np.squeeze(mask)
        gt = np.squeeze(gt_depth)
        pd = np.squeeze(pred_depth)
        sums["abs_rel"] += M.mask_abs_rel(pd, gt, tm)
        sums["sq_rel"] += M.mask_sq_rel(pd, gt, tm)
        sums["mse"] += M.mask_mse(pd, gt, tm)
        sums["mae"] += M.mask_mae(pd, gt, tm)
        sums["rmse"] += M.mask_rmse(pd, gt, tm)
        sums["rmse_log"] += M.mask_rmse_log(pd, gt, tm)
        sums["acc1"] += M.mask_accuracy_k(pd, gt, 1, tm)
        sums["acc2"] += M.mask_accuracy_k(pd, gt, 2, tm)
        sums["acc3"] += M.mask_accuracy_k(pd, gt, 3, tm)
        sums["psnr"] += M.mask_psnr(pred_aif, aif)
        sums["ssim"] += M.mask_ssim(pred_aif, aif)
        if use_lpips:
            sums["lpips"] += batch_LPIPS(np.clip(pred_aif, 0.0, 1.0),
                                         np.asarray(aif))
        n_val += 1

        if save_images:
            import cv2 as cv

            imwrite_colormap(f"{result_img_dir}/img{idx}_pred.png", pd,
                             vmax=gt.max())
            imwrite_colormap(f"{result_img_dir}/img{idx}_gt.png", gt)
            # AiF predictions, normalized like the reference's save_image
            # (2_aber_aware_dff_aif.py:222-224)
            for tag, img in (("pred_aif", pred_aif[0]), ("gt_aif", aif[0])):
                a = np.transpose(np.asarray(img), (1, 2, 0))
                lo, hi = a.min(), a.max()
                a = (a - lo) / max(hi - lo, 1e-12)
                cv.imwrite(f"{result_img_dir}/img{idx}_{tag}.png",
                           cv.cvtColor((a * 255).astype(np.uint8),
                                       cv.COLOR_RGB2BGR))

    n_val = max(n_val, 1)
    scores = {k: v / n_val for k, v in sums.items()}
    scores["avg_time"] = val_time / n_val
    for k, v in scores.items():
        logging.info(f"Avg_{k}({epoch}): {v}")
    return scores


# --------------------------------------------------------------------------
# Checkpointing (Orbax; params + optimizer + step, resume supported)
# --------------------------------------------------------------------------
def save_checkpoint(ckpt_dir: str, state: TrainState, name: str = "last"):
    from flax.serialization import to_bytes

    os.makedirs(ckpt_dir, exist_ok=True)
    # atomic: a kill mid-write (chunked jobs run under `timeout`) must leave
    # the previous checkpoint intact, not a truncated msgpack
    path = os.path.join(ckpt_dir, f"depth_net_{name}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(to_bytes(state))
    os.replace(tmp, path)


def load_checkpoint(ckpt_dir: str, state: TrainState, name: str = "last"):
    from flax.serialization import (from_state_dict, msgpack_restore,
                                    to_state_dict)

    with open(os.path.join(ckpt_dir, f"depth_net_{name}.msgpack"), "rb") as f:
        sd = msgpack_restore(f.read())
    # Committed eval checkpoints are stripped of optimizer state (~3x smaller,
    # see scripts/strip_ckpt.py); fill any missing fields from the caller's
    # freshly-initialised state so `--eval-only` loads them directly.
    full = dict(to_state_dict(state))
    if "opt_state" not in sd and "step" in sd:
        # Resuming *training* from a stripped checkpoint: a fresh opt_state
        # would restart the LR-schedule position at 0, silently resuming at
        # near-peak LR (round-3 advisor finding).  Re-seed the *schedule*
        # counts (matched by optax state type, not by any dict key named
        # 'count') from the saved step so schedules continue where training
        # stopped.  Adam's own ScaleByAdamState.count deliberately stays 0:
        # its moments are zero here, and seeding the count would make bias
        # correction assume warm moments — inflating the first few hundred
        # post-resume updates ~3-6x (round-4 advisor finding).  Prefer
        # resuming from the full `state` checkpoint when one exists.
        step = np.asarray(sd["step"], np.int32)
        _SCHEDULE_STATES = ("ScaleByScheduleState", "InjectHyperparamsState",
                            "InjectStatefulHyperparamsState")

        def _seed_schedule_counts(node):
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                if (type(node).__name__ in _SCHEDULE_STATES
                        and "count" in node._fields):
                    return node._replace(count=jnp.asarray(step))
                return type(node)(*(_seed_schedule_counts(v) for v in node))
            if isinstance(node, (list, tuple)):
                return type(node)(_seed_schedule_counts(v) for v in node)
            return node

        full["opt_state"] = to_state_dict(
            _seed_schedule_counts(state.opt_state))
        logging.warning(
            "checkpoint %s is stripped of opt_state: LR-schedule counts "
            "re-seeded to step %d; Adam restarts cold (moments AND "
            "bias-correction count zeroed — updates behave like a fresh "
            "Adam at the resumed schedule position)", name, int(step))
    full.update(sd)
    return from_state_dict(state, full)


class OrbaxManager:
    """Step-indexed checkpoint manager with retention (beyond the reference's
    overwrite-one-file scheme)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: TrainState):
        self.mgr.save(step, args=self._ocp.args.StandardSave(state))
        self.mgr.wait_until_finished()

    def restore(self, state: TrainState, step: Optional[int] = None):
        step = self.mgr.latest_step() if step is None else step
        return self.mgr.restore(step, args=self._ocp.args.StandardRestore(state))
