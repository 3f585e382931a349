"""A/B the fused-render kernel configs on the real TPU (VERDICT r2 #1b).

Times the production frame render (480x640, ks=11) for each (path, dtype,
tile) config by the two-point SLOPE between a K2-iteration and a
K1-iteration `lax.fori_loop` around an N_FRAMES-frame render, each loop a
single dispatch:

    device_ms_per_frame = (T(K2) - T(K1)) / ((K2 - K1) * N_FRAMES)

which cancels every fixed per-dispatch cost exactly — and, unlike the
earlier frame-count slope (K2=24 vs K1=8 frames, ~30 ms work delta), puts
a (K2-K1)*N_FRAMES ≈ 60-frame ≈ 115 ms work delta against the link's
multi-ms jitter, the same structural fix bench.py uses (a 2026-08-20
session with ~157 ms/dispatch fixed cost pushed the frame-count slope's
spread to 291%; the fori_loop slope measured 1.1% the same morning).
The loop body perturbs its input with the iteration index so XLA can
neither hoist the render nor DCE it.

Usage: python scripts/bench_fused_kernel.py [config ...]
  config: fused-f32-8x128 | fused-bf16-32x128 | mlponly-bf16-32x128 |
  convonly-f32-32x128 | fusedpipe-bf16-32x128 | twostage-bf16 |
  fusedstack-f32-32x128 (whole-stack kernel, all-arbitrary grid) |
  fusedstackpp-f32-32x128 (spatial dims "parallel", S "arbitrary") | ... ;
  no args = the full default sweep.  Results append to
  docs/kernel_sweep.jsonl (one JSON line per config, with RTT context).
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
H, W, KS = 480, 640, 11
# slope loop counts (fori_loop iterations around the N_FRAMES-frame render)
K1 = int(os.environ.get("AADFF_K1", 2))
K2 = int(os.environ.get("AADFF_K2", 8))
N_FRAMES = int(os.environ.get("AADFF_NFRAMES", 10))
# W=640 = 5*128 fixes tw=128; the pixel-batch widening axis is th.
DEFAULT_SWEEP = [
    "fused-f32-8x128", "fused-bf16-8x128",
    "fused-f32-16x128", "fused-bf16-16x128",
    "fused-f32-32x128", "fused-bf16-32x128",
    "twostage-bf16", "twostage-f32",
]


def build_fn(net, spec):
    """-> jitted (variables, img, depth, fds[K]) -> [K, C, H, W]."""
    parts = spec.split("-")
    kind, dtype = parts[0], parts[1]
    compute_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype]
    d_min, d_max = net.d_min, net.d_max
    model = net.model

    if kind in ("fusedstack", "fusedstackpp"):
        # whole-stack kernel: one launch renders all K frames of one image.
        # 'pp' variant annotates the spatial grid dims "parallel" so Mosaic
        # can pipeline blocks across tiles (r3 verdict #4 experiment); only
        # the S dim (the scratch-reuse dependency) stays "arbitrary".
        th, tw = (int(v) for v in parts[2].split("x"))
        sem = (("parallel", "parallel", "arbitrary")
               if kind == "fusedstackpp"
               else ("arbitrary", "arbitrary", "arbitrary"))
        from aadff_tpu.ops.pallas_render import fused_render_stack

        @jax.jit
        def fn(variables, img, depth, fds):
            return fused_render_stack(
                variables, img, depth, fds[None], KS, d_min, d_max,
                compute_dtype=compute_dtype, th=th, tw=tw,
                dim_semantics=sem,
            )[0]
    elif kind in ("fused", "fusedpipe", "mlponly", "convonly"):
        th, tw = (int(v) for v in parts[2].split("x"))
        mode = kind if kind in ("mlponly", "convonly") else "full"
        pipe = kind == "fusedpipe"
        from aadff_tpu.ops.pallas_render import fused_render_frame

        @jax.jit
        def fn(variables, img, depth, fds):
            def one(fd):
                return fused_render_frame(
                    variables, img, depth, fd[None], KS, d_min, d_max,
                    compute_dtype=compute_dtype, th=th, tw=tw,
                    mode=mode, pipe=pipe,
                )[0]
            return jax.lax.map(one, fds)
    elif kind == "prodstack":
        # the PRODUCTION entry (PSFNet.render_stack -> stack_impl ->
        # fused_render_stack with its default grid semantics) under the same
        # K-slope protocol as the raw-kernel configs above — separates
        # protocol effects (bench.py measures an S-slope on this same entry)
        # from path effects when the two disagree.
        net.render_dtype = dtype

        def fn(variables, img, depth, fds):
            return net.render_stack(img, depth, fds[None])
    elif kind == "twostage":
        from aadff_tpu.ops.pallas_mlp import flax_mlp_weights, mlp_psf_pallas
        from aadff_tpu.ops.render import local_psf_render

        @jax.jit
        def fn(variables, img, depth, fds):
            N, C, _, _ = img.shape
            z = jnp.clip((depth - d_min) / (d_max - d_min), 0.0, 1.0)
            z = z.reshape(N, H, W)
            x, y = jnp.meshgrid(jnp.linspace(-1, 1, W), jnp.linspace(1, -1, H),
                                indexing="xy")
            x = jnp.broadcast_to(x[None], (N, H, W))
            y = jnp.broadcast_to(y[None], (N, H, W))

            def one(fd):
                foc_z = jnp.clip((fd - d_min) / (d_max - d_min), 0.0, 1.0)
                o = jnp.stack(
                    [x, y, z, jnp.broadcast_to(foc_z, (N, H, W))], axis=-1)
                psf = mlp_psf_pallas(
                    o.reshape(-1, 4), flax_mlp_weights(variables), KS * KS,
                    compute_dtype=compute_dtype,
                )
                psf = psf.reshape(N, H, W, KS, KS)
                return local_psf_render(img, psf, kernel_size=KS)[0]
            return jax.lax.map(one, fds)
    else:
        raise ValueError(spec)
    return fn


def main():
    from aadff_tpu.psfnet import PSFNet
    from aadff_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    specs = sys.argv[1:] or DEFAULT_SWEEP

    net = PSFNet(filename=LENS, sensor_res=(H, W), kernel_size=KS)
    net.load_net(CKPT)
    rng = np.random.default_rng(0)
    depth = jnp.asarray(-rng.uniform(500, 15000, (1, 1, H, W)).astype(np.float32))
    fds = jnp.asarray(-np.sort(rng.uniform(500, 15000, N_FRAMES))[::-1].copy(),
                      jnp.float32)
    # distinct image contents per timed call: the tunnel caches repeated
    # identical executions.  Sized for warm-up + reps (AADFF_SLOPE_REPS
    # raises the slope_rate rep count).
    n_imgs = 2 + int(os.environ.get("AADFF_SLOPE_REPS", 5))
    imgs = [jnp.asarray(rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32))
            for _ in range(n_imgs)]

    rtt_ms = measure_rtt(n_reps=20)
    print(f"[sweep] link RTT {rtt_ms:.1f} ms", file=sys.stderr)
    out_path = os.path.join(REPO, "docs", "kernel_sweep.jsonl")
    import functools

    for spec in specs:
        fn = build_fn(net, spec)
        compile_s = [0.0]

        @functools.partial(jax.jit, static_argnums=0)
        def loop(k, variables, img, depth, fds, fn=fn):
            # the body input varies with i so XLA cannot hoist the render
            # out of the loop; the carry consumes the output against DCE
            def body(i, carry):
                out = fn(variables,
                         img * (1.0 + 1e-6 * i.astype(jnp.float32)),
                         depth, fds)
                return carry + out.ravel()[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        def run(k, i, loop=loop, compile_s=compile_s):
            t0 = time.perf_counter()
            loop(k, net.variables, imgs[i], depth, fds).block_until_ready()
            if i == 0:  # first call per loop count = compile
                compile_s[0] += time.perf_counter() - t0

        detail = {}
        try:
            loops_per_sec, t_med = slope_rate(run, K1, K2, detail=detail)
        except Exception as e:
            # a config can be unbuildable on this chip (e.g. a tall tile
            # overflowing VMEM) — record it and keep sweeping the rest
            rec = {"config": spec, "error": f"{type(e).__name__}: {e}"[:300],
                   "date": time.strftime("%Y-%m-%d")}
            print(json.dumps(rec))
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            continue
        rate_fps = loops_per_sec * N_FRAMES
        ms_frame = 1e3 / rate_fps
        rec = {
            "config": spec, "device_ms_per_frame": round(ms_frame, 3),
            "compute_fps": round(rate_fps, 1),
            "slope_spread_pct": detail.get("slope_spread_pct"),
            "slope_protocol": detail.get("protocol"),
            "dispatch_ms": {k: round(v * 1e3, 1) for k, v in t_med.items()},
            "fixed_ms_per_dispatch": round(
                t_med[K1] * 1e3 - K1 * N_FRAMES * ms_frame, 1),
            "link_roundtrip_ms": round(rtt_ms, 2),
            "method": f"slope fori_loop k1={K1} k2={K2} x {N_FRAMES} frames",
            "compile_s": round(compile_s[0], 1),
            "date": time.strftime("%Y-%m-%d"),
        }
        print(json.dumps(rec))
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
