"""A/B the fused-render kernel configs on the real TPU (VERDICT r2 #1b).

Times the production frame render (480x640, ks=11) for each (path, dtype,
tile) config with the per-dispatch link round trip subtracted: one jitted
program renders K frames (lax.map), so

    device_ms_per_frame ~= (T_dispatch - RTT) / K

with RTT measured on a tiny no-op program.  K=24 makes the RTT correction
<25% of the measurement even on a 30 ms link, and the remaining RTT
*variance* (+-few ms) <1%.

Usage: python scripts/bench_fused_kernel.py [config ...]
  config: fused-f32-8x128 | fused-bf16-16x256 | twostage-bf16 | ... ;
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

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
LENS = os.path.join(REPO, "lenses/rf50mm.json")
CKPT = os.path.join(REPO, "ckpt/rf50mm/psfnet_480x640_ks11.msgpack")
H, W, KS = 480, 640, 11
K_FRAMES = 24
DEFAULT_SWEEP = [
    "fused-f32-8x128", "fused-bf16-8x128",
    "fused-f32-16x256", "fused-bf16-16x256",
    "fused-bf16-16x128", "fused-bf16-8x256", "fused-bf16-32x256",
    "twostage-bf16", "twostage-f32",
]


def measure_rtt(n=20):
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda a: a + 1.0)
    f(x).block_until_ready()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def build_fn(net, spec):
    """-> jitted (variables, img, depth, fds[K]) -> [K, C, H, W]."""
    parts = spec.split("-")
    kind, dtype = parts[0], parts[1]
    compute_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype]
    d_min, d_max = net.d_min, net.d_max
    model = net.model

    if kind == "fused":
        th, tw = (int(v) for v in parts[2].split("x"))
        from aadff_tpu.ops.pallas_render import fused_render_frame

        @jax.jit
        def fn(variables, img, depth, fds):
            def one(fd):
                return fused_render_frame(
                    variables, img, depth, fd[None], KS, d_min, d_max,
                    compute_dtype=compute_dtype, th=th, tw=tw,
                )[0]
            return jax.lax.map(one, fds)
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
    fds = jnp.asarray(-np.sort(rng.uniform(500, 15000, K_FRAMES))[::-1].copy(),
                      jnp.float32)
    # distinct image contents per timed call: the tunnel caches repeated
    # identical executions
    imgs = [jnp.asarray(rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32))
            for _ in range(7)]

    rtt = measure_rtt()
    print(f"[sweep] link RTT {rtt * 1e3:.1f} ms", file=sys.stderr)
    out_path = os.path.join(REPO, "docs", "kernel_sweep.jsonl")
    for spec in specs:
        fn = build_fn(net, spec)
        t_c0 = time.perf_counter()
        fn(net.variables, imgs[0], depth, fds).block_until_ready()  # compile
        compile_s = time.perf_counter() - t_c0
        fn(net.variables, imgs[1], depth, fds).block_until_ready()  # warm
        ts = []
        for i in range(2, 7):
            t0 = time.perf_counter()
            fn(net.variables, imgs[i], depth, fds).block_until_ready()
            ts.append(time.perf_counter() - t0)
        t_med = float(np.median(ts))
        ms_frame = max(t_med - rtt, 1e-9) / K_FRAMES * 1e3
        rec = {
            "config": spec, "device_ms_per_frame": round(ms_frame, 3),
            "compute_fps": round(1e3 / ms_frame, 1),
            "dispatch_ms": round(t_med * 1e3, 1),
            "link_roundtrip_ms": round(rtt * 1e3, 2),
            "k_frames": K_FRAMES, "compile_s": round(compile_s, 1),
            "date": time.strftime("%Y-%m-%d"),
        }
        print(json.dumps(rec))
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
