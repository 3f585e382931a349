"""Full benchmark suite (SURVEY.md §7 step 7): focal-stack render throughput,
ray-traced PSFs/sec, PSFNet fit iters/sec, DFF train step/sec.

Prints a JSON report AND persists it to BENCH_SUITE.json at the repo root
(committed artifact, so the README's throughput claims are reproducible);
`bench.py` at the repo root remains the single-line driver contract
(render fps only).  Usage: python scripts/benchmark_suite.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from aadff_tpu.utils.benchmeasure import measure_rtt, slope_rate

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
LENS = os.path.join(REPO, "lenses/rf50mm.json")
CKPT = os.path.join(REPO, "ckpt/rf50mm/psfnet_480x640_ks11.msgpack")
H, W, KS, S = 480, 640, 11, 10


def bench_render(net):
    """(wall_fps, compute_fps): wall for the production 10-frame stack
    dispatch; compute via the slope between a k2- and a k1-iteration
    `fori_loop` around the full S-frame render, each loop one dispatch
    (bench.py's protocol — the (k2-k1)*S ≈ 60-frame work delta dwarfs link
    jitter, unlike the previous 10-vs-30-frame S-slope whose ~40 ms delta
    fell into the noise-inversion fallback in the 2026-08-19 suite run)."""
    import functools

    k1, k2 = 2, 8
    rng = np.random.default_rng(0)
    depth = jnp.asarray(-rng.uniform(500, 15000, (1, 1, H, W)).astype(np.float32))
    fds = jnp.asarray(
        -np.sort(rng.uniform(500, 15000, (1, S)))[:, ::-1].copy(), jnp.float32)
    # distinct inputs per rep (tunnel caches identical executions); sized
    # for warm-up + reps under AADFF_SLOPE_REPS overrides
    n_imgs = 2 + int(os.environ.get("AADFF_SLOPE_REPS", 5))
    imgs = [jnp.asarray(rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32))
            for _ in range(n_imgs)]

    @functools.partial(jax.jit, static_argnums=0)
    def render_loop(k, img, depth, fds):
        def body(i, carry):
            out = net.render_stack(img * (1.0 + 1e-6 * i.astype(jnp.float32)),
                                   depth, fds)
            return carry + out[0, 0, 0, 0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    def run(k, i):
        render_loop(k, imgs[i], depth, fds).block_until_ready()

    detail = {}
    loops_per_sec, _ = slope_rate(run, k1, k2, detail=detail)
    compute_fps = (None if detail.get("fallback") else loops_per_sec * S)

    net.render_stack(imgs[0], depth, fds).block_until_ready()  # warm
    wall_ts = []
    for i in range(1, 4):
        t0 = time.perf_counter()
        net.render_stack(imgs[i], depth, fds).block_until_ready()
        wall_ts.append(time.perf_counter() - t0)
    wall_fps = S / float(np.median(wall_ts))
    return wall_fps, compute_fps, detail.get("slope_spread_pct")


def bench_psfs(net, spp=4096, n_short=128, n_long=512):
    """Device PSFs/sec via the same two-point slope as bench_render: batch
    sizes n_short and n_long each get their own program + fixed dispatch
    cost; the difference cancels it (inputs are KB-sized, so upload time is
    batch-independent)."""
    rng = np.random.default_rng(1)

    def pts(n):
        return jnp.asarray(np.stack([
            rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
            -rng.uniform(500, 20000, n)], -1).astype(np.float32))

    def run(n, i):
        net.psf(pts(n), spp=spp).block_until_ready()

    rate, _ = slope_rate(run, n_short, n_long, n_reps=4)
    return rate


def bench_psfnet_fit(net, n_chunks=4, K=25, bs=128, spp=4096):
    """Steady-state fit throughput: time dispatches of the production
    K-iteration scan program (what a long `train_psfnet` run executes),
    compile excluded."""
    import optax

    optimizer = optax.adamw(
        optax.cosine_decay_schedule(1e-4, decay_steps=100_000, alpha=0.0)
    )
    opt_state = optimizer.init(net.variables)
    scan_step = net._build_train_scan(bs, spp, optimizer)
    per_focus = []
    for foc_z, foc_d in zip(net.foc_z_arr, net.foc_d_arr):
        net.lens.refocus(float(foc_d))
        per_focus.append(net._lens_scalars())
    stacked = tuple(jnp.stack([s[j] for s in per_focus])
                    for j in range(len(per_focus[0])))
    foc_z_arr = np.asarray(net.foc_z_arr, np.float32)
    rng = np.random.default_rng(3)
    active = jnp.ones(K, bool)

    def dispatch(variables, opt_state, seed):
        idx = rng.integers(0, len(foc_z_arr), size=K)
        keys = jax.random.split(jax.random.PRNGKey(seed), K)
        return scan_step(variables, opt_state, keys,
                         jnp.asarray(foc_z_arr[idx]), jnp.asarray(idx),
                         active, net.lens.params, stacked)

    # fresh copy: scan_step donates its input buffers, and net.variables
    # must stay valid for the other benchmarks
    variables = jax.tree.map(jnp.array, net.variables)
    variables, opt_state, losses = dispatch(variables, opt_state, 0)
    jax.block_until_ready(losses)  # compile + warm-up
    t0 = time.perf_counter()
    for s in range(1, n_chunks + 1):
        variables, opt_state, losses = dispatch(variables, opt_state, s)
    jax.block_until_ready(losses)
    return n_chunks * K / (time.perf_counter() - t0)


def bench_dff_step(net):
    import optax

    from aadff_tpu.models.aifnet import AiFDepthNet
    from aadff_tpu.train.trainer import create_train_state, make_aif_train_step

    B, n_stack = 2, 8
    rng = np.random.default_rng(2)
    stack = jnp.asarray(rng.uniform(0, 1, (B, n_stack, H, W, 3)).astype(np.float32))
    fds = jnp.asarray(np.sort(rng.uniform(0.5, 15, (B, n_stack))).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 15, (B, 1, H, W)).astype(np.float32))
    aif = jnp.asarray(rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32))
    model = AiFDepthNet(n_stack=n_stack)
    optimizer = optax.adam(1e-4)
    state = create_train_state(model, optimizer, stack[:1], fds[:1],
                               jax.random.PRNGKey(0))
    step = make_aif_train_step(model, optimizer, task="D_FS")
    state, losses = step(state, stack, fds, depth, aif)
    jax.block_until_ready(losses["total"])
    t0 = time.perf_counter()
    for _ in range(3):
        state, losses = step(state, stack, fds, depth, aif)
    jax.block_until_ready(losses["total"])
    return 3 / (time.perf_counter() - t0)


def main():
    from aadff_tpu.psfnet import PSFNet
    from aadff_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    net = PSFNet(filename=LENS, sensor_res=(H, W), kernel_size=KS)
    net.load_net(CKPT)

    # Dispatch round-trip of the tunnelled platform (observed 1-40 ms by
    # session) — dominates the small-program numbers below; record it so the
    # artifact is interpretable across sessions.
    rtt_ms = measure_rtt(n_reps=10)

    wall_fps, compute_fps, spread_pct = bench_render(net)
    report = {
        "device": str(jax.devices()[0]),
        "date": time.strftime("%Y-%m-%d"),
        "link_roundtrip_ms": round(rtt_ms, 2),
        "render_dtype": net.render_dtype,
        # null when the slope fell into the noise-inversion fallback — a
        # wall rate must never be published as device throughput
        "render_fps_device_480x640_ks11": (round(compute_fps, 2)
                                           if compute_fps is not None
                                           else None),
        "render_slope_spread_pct": spread_pct,
        "render_fps_wall_480x640_ks11": round(wall_fps, 2),
        "raytraced_psfs_per_sec_spp4096": round(bench_psfs(net), 1),
        "psfnet_fit_iters_per_sec_bs128_spp4096": round(bench_psfnet_fit(net), 2),
        "aifnet_train_steps_per_sec_bs2_s8": round(bench_dff_step(net), 3),
    }
    print(json.dumps(report, indent=2))
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_SUITE.json"
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
