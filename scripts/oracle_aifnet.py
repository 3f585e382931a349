"""Cross-framework AiFDepthNet training oracle (VERDICT r2 #2).

Round-2 left a question open: AiFNet barely learned on SynthMiddlebury while
DFVNet converged cleanly on identical data — is our AiFNet port broken, or
is the recipe/data at fault?  This script settles it by training the
REFERENCE torch AiFNet (/root/reference/dff/AiFNet.py, loaded by file path —
it only needs torch+numpy) and our Flax port side by side on IDENTICAL
synthetic focal-stack batches (rendered once with the deterministic ThinLens
model), identical task (D_FS), lr, optimizer, and step count, on CPU.

Weights cannot be bit-matched across frameworks (different init RNG), so the
oracle compares loss *trajectories*: start level, decay shape, and end level.
If the torch reference learns on this data and ours does not (or vice
versa), the port is the suspect; if both track, the round-2 flatness was
recipe/data-scale noise.

Writes docs/aifnet_oracle.json.  Usage:
    python scripts/oracle_aifnet.py [--steps N] [--lr LR]
(CPU-only; forces the JAX CPU backend so torch and jax see the same machine.)
"""
import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from aadff_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
B, S, H, W = 2, 4, 64, 64
N_BATCHES = 8


def make_batches(seed=0):
    """Deterministic aberration-free focal stacks: random textures blurred by
    the ThinLens CoC model at S focus distances over a smooth depth map."""
    import jax.numpy as jnp

    from aadff_tpu.psfnet import ThinLens

    lens = ThinLens(50.0, 1.8, 11, [25.968, 25.968], (H, W))
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(N_BATCHES):
        # smooth random depth in [0.6, 2.8] m
        base = rng.uniform(0, 1, (B, 1, 8, 8)).astype(np.float32)
        depth = np.asarray(jax.image.resize(jnp.asarray(base), (B, 1, H, W),
                                            "bicubic"))
        depth = 0.6 + 2.2 * (depth - depth.min()) / (np.ptp(depth) + 1e-9)
        # textured AiF image
        aif = rng.uniform(0, 1, (B, 3, H // 4, W // 4)).astype(np.float32)
        aif = np.asarray(jax.image.resize(jnp.asarray(aif), (B, 3, H, W),
                                          "nearest"))
        fd = np.broadcast_to(
            np.linspace(0.6, 2.8, S, dtype=np.float32), (B, S)).copy()
        frames = [
            np.asarray(lens.render(aif, -depth * 1e3, -fd[:, i] * 1e3))
            for i in range(S)
        ]
        stack = np.stack(frames, axis=1)  # [B, S, 3, H, W]
        batches.append(dict(stack=stack.astype(np.float32), depth=depth,
                            aif=aif, fd=fd))
    return batches


def train_reference(batches, steps, lr, seed=126):
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_aifnet", "/root/reference/dff/AiFNet.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(seed)
    net = ref.AiFDepthNet(n_stack=S)
    opt = torch.optim.Adam(net.parameters(), lr=lr)
    args = {"stack_num": S, "device": "cpu", "task": "D_FS"}
    losses = []
    net.train()
    for step in range(steps):
        b = batches[step % len(batches)]
        input_dict = {
            "stack_rgb_img": torch.tensor(b["stack"]).permute(0, 2, 1, 3, 4),
            "focus_position": torch.tensor(b["fd"]),
            "depth": torch.tensor(b["depth"]),
        }
        out_losses, _ = net(input_dict, args)
        opt.zero_grad()
        out_losses["total"].backward()
        opt.step()
        losses.append(float(out_losses["total"]))
    return losses


def train_ours(batches, steps, lr, seed=126):
    import jax.numpy as jnp
    import optax

    from aadff_tpu.models.aifnet import AiFDepthNet
    from aadff_tpu.train.trainer import create_train_state, make_aif_train_step

    model = AiFDepthNet(n_stack=S)
    optimizer = optax.adam(lr)
    state = create_train_state(
        model, optimizer, jnp.zeros((1, S, H, W, 3), jnp.float32),
        jnp.zeros((1, S), jnp.float32), jax.random.PRNGKey(seed),
    )
    step_fn = make_aif_train_step(model, optimizer, task="D_FS")
    losses = []
    for step in range(steps):
        b = batches[step % len(batches)]
        stack = jnp.transpose(jnp.asarray(b["stack"]), (0, 1, 3, 4, 2))
        state, l = step_fn(state, stack, jnp.asarray(b["fd"]),
                           jnp.asarray(b["depth"]), jnp.asarray(b["aif"]))
        losses.append(float(l["total"]))
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--skip", choices=["ref", "ours"], default=None)
    args = ap.parse_args()

    batches = make_batches()
    out_path = os.path.join(REPO, "docs", "aifnet_oracle.json")
    rec = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            rec = json.load(f)
    # fresh run metadata wins over any stale file contents
    rec.update({"steps": args.steps, "lr": args.lr, "task": "D_FS",
                "shapes": f"bs={B} stack={S} res={H}x{W}, "
                          f"{N_BATCHES} fixed batches"})

    def summarize(losses):
        k = max(len(losses) // 10, 1)
        return {
            "first10_mean": float(np.mean(losses[:10])),
            "last10pct_mean": float(np.mean(losses[-k:])),
            "min": float(np.min(losses)),
            "curve_every10": [round(float(x), 4) for x in losses[::10]],
        }

    if args.skip != "ours":
        print("training ours (flax)...", flush=True)
        rec["ours"] = summarize(train_ours(batches, args.steps, args.lr))
        print(json.dumps(rec["ours"]["curve_every10"]))
    if args.skip != "ref":
        print("training reference (torch)...", flush=True)
        rec["reference"] = summarize(train_reference(batches, args.steps, args.lr))
        print(json.dumps(rec["reference"]["curve_every10"]))

    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
