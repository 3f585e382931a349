"""Isolate the AiF train-step overhead found by profile_train_step.py.

docs/train_step_profile.jsonl shows (2026-08-19): grad 231.3 ms but the full
train step 467.5 ms — the optimizer+guard epilogue appears to cost another
full fwd+bwd, which no op accounting explains (Adam on 16.5M params plus the
isfinite guard is ~1 GB of HBM traffic, ≈2 ms at speed of light).  This
script slope-measures the step in cumulative variants to find the jump:

    grad_aux    value_and_grad(has_aux) exactly as the train step computes it
    grad_touch  + params perturbed per iteration (p + 1e-30*g) but NO
                optimizer arithmetic — separates "params are loop-variant"
                (which defeats XLA's loop-invariant hoisting of per-step
                weight-layout work) from genuine optimizer cost
    grad_adam   + optimizer.update/apply_updates (no guard)
    full_step   + the non-finite guard (== make_aif_train_step)

Interpretation: in grad_aux the params never change across the fori_loop, so
XLA may hoist per-step weight preprocessing (layout transposes for the 3D
convs) out of the loop — underestimating the true per-step gradient cost.  If
grad_touch ≈ grad_adam ≈ full_step, the apparent "optimizer epilogue" gap in
docs/train_step_profile.jsonl is that hoisting artifact and the real training
loop's cost is full_step with grad ≈ grad_touch; if grad_touch ≈ grad_aux,
the optimizer/guard genuinely costs the difference.

Each variant is a K-iteration fori_loop inside one jit, K in {1,3}, slope
cancels dispatch (same protocol as profile_train_step.py).

Usage: python scripts/profile_step_variants.py [aif|dfv ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", "").split(","):
    jax.config.update("jax_platforms", "cpu")

from aadff_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np
import optax

from aadff_tpu.utils.benchmeasure import measure_rtt, slope_rate

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
LENS = os.path.join(REPO, "lenses/rf50mm.json")
CKPT = os.path.join(REPO, "ckpt/rf50mm/psfnet_480x640_ks11.msgpack")
B, S, H, W, KS = 2, 8, 480, 640, 11
if os.environ.get("AADFF_PROFILE_TINY"):
    B, S, H, W = 1, 4, 32, 128
BF16 = bool(os.environ.get("AADFF_BF16"))  # bf16 conv trunk (DESIGN.md §9)
K1, K2 = 1, 3


def build(which: str):
    from aadff_tpu.psfnet import PSFNet
    from aadff_tpu.train.trainer import (TrainState, create_train_state,
                                         guard_nonfinite)

    net = PSFNet(filename=LENS, sensor_res=(H, W), kernel_size=KS)
    net.load_net(CKPT)
    rng = np.random.default_rng(1)
    aif = jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 15.0, (B, 1, H, W)).astype(np.float32))
    fds = jnp.asarray(np.sort(rng.uniform(0.5, 15.0, (B, S)), axis=1
                              ).astype(np.float32))
    stack0 = jnp.transpose(net.render_stack(aif, depth * -1e3, fds * -1e3),
                           (0, 1, 3, 4, 2))
    optimizer = optax.adam(optax.cosine_decay_schedule(1e-4, 1000))

    if which == "aif":
        from aadff_tpu.models.aifnet import AiFDepthNet, compute_loss

        model = AiFDepthNet(n_stack=S, dtype=jnp.bfloat16 if BF16 else None)
        state = create_train_state(model, optimizer, stack0[:1], fds[:1],
                                   jax.random.PRNGKey(0))

        def loss_fn(params, batch_stats, stack, f):
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                stack, f, train=True, mutable=["batch_stats"])
            losses = compute_loss(out, {"depth": depth, "AiF_img": aif},
                                  "D_FS")
            return losses["total"], (losses, updates["batch_stats"])
    else:
        from aadff_tpu.models.dfv import DFVNet, dfv_loss

        model = DFVNet(clean=False, level=2, use_diff=1)
        state = create_train_state(model, optimizer, stack0[:1], fds[:1],
                                   jax.random.PRNGKey(0))

        def loss_fn(params, batch_stats, stack, f):
            (stacked, stds), updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                stack, f, train=True, mutable=["batch_stats"])
            loss = dfv_loss(stacked, stds, depth, depth > 0)
            return loss, ({"total": loss}, updates["batch_stats"])

    vg = jax.value_and_grad(loss_fn, has_aux=True)

    def grad_aux(st, stack, f):
        (loss, (losses, new_bs)), grads = vg(st.params, st.batch_stats,
                                             stack, f)
        return st.replace(batch_stats=new_bs), (loss, grads)

    def grad_touch(st, stack, f):
        (loss, (losses, new_bs)), grads = vg(st.params, st.batch_stats,
                                             stack, f)
        params = jax.tree_util.tree_map(lambda p, g: p + 1e-30 * g,
                                        st.params, grads)
        return st.replace(params=params, batch_stats=new_bs), loss

    def grad_adam(st, stack, f):
        (loss, (losses, new_bs)), grads = vg(st.params, st.batch_stats,
                                             stack, f)
        updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return st.replace(params=params, batch_stats=new_bs,
                          opt_state=opt_state, step=st.step + 1), loss

    def full_step(st, stack, f):
        (loss, (losses, new_bs)), grads = vg(st.params, st.batch_stats,
                                             stack, f)
        updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        params = guard_nonfinite(ok, params, st.params)
        opt_state = guard_nonfinite(ok, opt_state, st.opt_state)
        new_bs = guard_nonfinite(ok, new_bs, st.batch_stats)
        return st.replace(params=params, batch_stats=new_bs,
                          opt_state=opt_state, step=st.step + 1), loss

    def looped(body_fn):
        def make(k):
            @jax.jit
            def run(st, stack, f):
                def body(it, s):
                    s2, _ = body_fn(s, stack + it * 1e-6, f)
                    return s2
                return jax.lax.fori_loop(0, k, body, st)
            return run
        return make

    eps = jnp.float32(1e-5)
    variants = {name: (looped(fn), lambda i: (state, stack0 + i * eps, fds))
                for name, fn in [("grad_aux", grad_aux),
                                 ("grad_touch", grad_touch),
                                 ("grad_adam", grad_adam),
                                 ("full_step", full_step)]}
    return variants


def main():
    for which in (sys.argv[1:] or ["aif"]):
        variants = build(which)
        only = os.environ.get("AADFF_VARIANTS")  # e.g. "full_step" for a
        if only:                                 # same-session dtype A/B
            variants = {k: v for k, v in variants.items()
                        if k in only.split(",")}
        rtt = measure_rtt()
        rec = {"model": which, "B": B, "S": S, "res": [H, W],
               "compute_dtype": "bf16" if BF16 else "f32",
               "link_roundtrip_ms": round(rtt, 2),
               "method": f"fori_loop slope K1={K1} K2={K2}",
               "date": time.strftime("%Y-%m-%d")}
        print(f"[{which}] link RTT {rtt:.1f} ms", file=sys.stderr)
        for name, (make, args_of) in variants.items():
            fns = {k: make(k) for k in (K1, K2)}
            t0 = time.perf_counter()

            def run(k, i):
                jax.block_until_ready(fns[k](*args_of(i)))

            rate, times = slope_rate(run, K1, K2, n_reps=4, n_warm=2)
            rec[f"{name}_ms"] = round(1e3 / rate, 1)
            print(f"[{which}] {name}: {1e3 / rate:.1f} ms "
                  f"(stage wall {time.perf_counter() - t0:.0f}s)",
                  file=sys.stderr)
        print(json.dumps(rec))
        with open(os.path.join(REPO, "docs", "step_variant_profile.jsonl"),
                  "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
