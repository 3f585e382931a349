"""Decompose the end-to-end DFF train step on the real TPU (VERDICT r3 #5).

The render kernel has a full MFU story; the actual training workload never
had one.  This measures, at the reference operating point (bs=2, S=8,
480x640, ks=11 — configs/aber_aware_dff_aif.yml), the device time of each
stage of the training inner loop for both model families:

    render   — aberrated focal-stack synthesis through the PSF surrogate
               (reference 2_aber_aware_dff_aif.py:107-116)
    fwd      — model forward + loss (train mode, BN stats mutable)
    grad     — value_and_grad of the same (fwd + bwd)
    step     — full jitted train step (grad + Adam + non-finite guard)
    step+render — what the training loop actually runs per batch

Each stage is timed by the repo's slope protocol (utils/benchmeasure): a
K-iteration `lax.fori_loop` inside one jit, two sizes, slope cancels the
fixed dispatch cost.  Inputs vary per repetition (the tunnel caches repeated
identical executions) and per loop iteration (so XLA cannot collapse the
loop body).

CAVEAT (docs/DESIGN.md §9): the fwd/grad stages hold params loop-invariant,
so XLA hoists per-step weight-layout work out of the loop and they
UNDER-REPORT (AiF grad reads 231 ms vs a true 467 ms — see
scripts/profile_step_variants.py).  Only `step`/`step_render` (params vary
per iteration) reflect real training cost; fwd/grad are lower bounds.

Set AADFF_BF16=1 to profile the bf16-trunk variant of AiFDepthNet.

Output: one JSON line per model appended to docs/train_step_profile.jsonl
with the decomposition in ms and derived steps/s.

Usage: python scripts/profile_train_step.py [aif|dfv ...]   (default: both)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

# honour JAX_PLATFORMS=cpu for the tiny smoke mode (the axon sitecustomize
# force-sets jax_platforms="axon,cpu"; see .claude/skills/verify/SKILL.md)
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
if os.environ.get("AADFF_PROFILE_TINY"):  # CPU smoke test of the machinery
    B, S, H, W = 1, 4, 32, 128
BF16 = bool(os.environ.get("AADFF_BF16"))  # bf16 conv trunk (DESIGN.md §9)
K1, K2 = 1, 3


def build_stages(which: str):
    """-> dict stage -> jitted fn(k_static, i) run protocol closure."""
    from aadff_tpu.psfnet import PSFNet
    from aadff_tpu.train.trainer import create_train_state

    net = PSFNet(filename=LENS, sensor_res=(H, W), kernel_size=KS)
    net.load_net(CKPT)

    rng = np.random.default_rng(1)
    aif = jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 15.0, (B, 1, H, W)).astype(np.float32))
    fds = jnp.asarray(np.sort(rng.uniform(0.5, 15.0, (B, S)), axis=1
                              ).astype(np.float32))
    depth_mm, fds_mm = depth * -1e3, fds * -1e3

    def render(d_mm, f_mm):
        return net.render_stack(aif, d_mm, f_mm)  # [B, S, C, H, W]

    stack0 = jnp.transpose(render(depth_mm, fds_mm), (0, 1, 3, 4, 2))

    optimizer = optax.adam(optax.cosine_decay_schedule(1e-4, 1000))
    if which == "aif":
        from aadff_tpu.models.aifnet import AiFDepthNet, compute_loss
        from aadff_tpu.train.trainer import make_aif_train_step

        model = AiFDepthNet(n_stack=S, dtype=jnp.bfloat16 if BF16 else None)
        state = create_train_state(model, optimizer, stack0[:1], fds[:1],
                                   jax.random.PRNGKey(0))
        train_step = make_aif_train_step(model, optimizer, task="D_FS")

        def loss_fn(params, batch_stats, stack, f):
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                stack, f, train=True, mutable=["batch_stats"])
            losses = compute_loss(out, {"depth": depth, "AiF_img": aif},
                                  "D_FS")
            return losses["total"]

        def step(st, stack, f):
            return train_step(st, stack, f, depth, aif)
    else:
        from aadff_tpu.models.dfv import DFVNet, dfv_loss
        from aadff_tpu.train.dff_dfv import make_dfv_train_step

        model = DFVNet(clean=False, level=2, use_diff=1)
        state = create_train_state(model, optimizer, stack0[:1], fds[:1],
                                   jax.random.PRNGKey(0))
        train_step = make_dfv_train_step(model, optimizer)

        def loss_fn(params, batch_stats, stack, f):
            (stacked, stds), _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                stack, f, train=True, mutable=["batch_stats"])
            return dfv_loss(stacked, stds, depth, depth > 0)

        def step(st, stack, f):
            return train_step(st, stack, f, depth)

    grad_fn = jax.grad(loss_fn)

    # --- stage programs: k repetitions in one dispatch -------------------
    def make_render(k):
        @jax.jit
        def run(d_mm, f_mm):
            def body(it, acc):
                out = render(d_mm + it * 1e-6, f_mm)
                return acc + out[0, 0, 0, 0, 0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return run

    def make_fwd(k):
        @jax.jit
        def run(params, batch_stats, stack, f):
            def body(it, acc):
                return acc + loss_fn(params, batch_stats,
                                     stack + it * 1e-6, f)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return run

    def make_grad(k):
        @jax.jit
        def run(params, batch_stats, stack, f):
            def body(it, acc):
                g = grad_fn(params, batch_stats, stack + it * 1e-6, f)
                return acc + jax.tree.leaves(g)[0].ravel()[0]
            return jax.lax.fori_loop(0, k, body, 0.0)
        return run

    def make_step(k):
        @jax.jit
        def run(st, stack, f):
            def body(it, s):
                s2, _ = step(s, stack + it * 1e-6, f)
                return s2
            return jax.lax.fori_loop(0, k, body, st)
        return run

    def make_step_render(k):
        @jax.jit
        def run(st, d_mm, f_mm, f):
            def body(it, s):
                stk = jnp.transpose(render(d_mm + it * 1e-6, f_mm),
                                    (0, 1, 3, 4, 2))
                s2, _ = step(s, stk, f)
                return s2
            return jax.lax.fori_loop(0, k, body, st)
        return run

    eps = jnp.float32(1e-5)  # per-call input variation (tunnel exec cache)
    stages = {
        "render": (make_render,
                   lambda i: (depth_mm + i * eps, fds_mm)),
        "fwd": (make_fwd,
                lambda i: (state.params, state.batch_stats,
                           stack0 + i * eps, fds)),
        "grad": (make_grad,
                 lambda i: (state.params, state.batch_stats,
                            stack0 + i * eps, fds)),
        "step": (make_step, lambda i: (state, stack0 + i * eps, fds)),
        "step_render": (make_step_render,
                        lambda i: (state, depth_mm + i * eps, fds_mm, fds)),
    }
    return stages


def profile(which: str):
    stages = build_stages(which)
    rtt_ms = measure_rtt()
    print(f"[{which}] link RTT {rtt_ms:.1f} ms", file=sys.stderr)
    rec = {"model": which, "B": B, "S": S, "res": [H, W], "ks": KS,
           "compute_dtype": "bf16" if BF16 else "f32",
           "link_roundtrip_ms": round(rtt_ms, 2),
           "method": f"fori_loop slope K1={K1} K2={K2}",
           "date": time.strftime("%Y-%m-%d")}
    for name, (make, args_of) in stages.items():
        fns = {k: make(k) for k in (K1, K2)}
        t0 = time.perf_counter()

        def run(k, i):
            out = fns[k](*args_of(i))
            jax.block_until_ready(out)

        rate, times = slope_rate(run, K1, K2, n_reps=4, n_warm=2)
        ms = 1e3 / rate
        rec[f"{name}_ms"] = round(ms, 1)
        rec[f"{name}_dispatch_s"] = {k: round(v, 2) for k, v in times.items()}
        print(f"[{which}] {name}: {ms:.1f} ms "
              f"(stage wall {time.perf_counter() - t0:.0f}s)",
              file=sys.stderr)
    # NOTE: no derived bwd/opt splits — fwd/grad under-report (loop-invariant
    # params let XLA hoist per-step weight-layout work; DESIGN.md §9), so
    # differences against them mis-attribute.  step/step_render are the
    # trustworthy rows.
    rec["steps_per_sec_device"] = round(1e3 / rec["step_render_ms"], 3)
    out_path = os.path.join(REPO, "docs", "train_step_profile.jsonl")
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def main():
    which = sys.argv[1:] or ["aif", "dfv"]
    for w in which:
        profile(w)


if __name__ == "__main__":
    main()
