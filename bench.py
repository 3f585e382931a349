"""Benchmark: aberrated focal-stack rendering throughput (the hot path).

Measures frames/sec of the production renderer — PSFNet MLP over the per-pixel
(x, y, z, foc_dist) field + per-pixel 11x11 PSF convolution at 480x640 — on
the available accelerator (TPU when present).  Reports BOTH device-time fps
(`value`, dispatch-overhead-free via a two-point slope) and wall fps with the
measured link round trip, because the tunnelled TPU's 1-40 ms/dispatch RTT
otherwise dominates and varies by session (r2's wall-only number regressed
while the kernel got faster).

`vs_baseline` compares against the PyTorch reference renderer measured on this
machine's CPU (the only hardware both frameworks share here; the reference
repo publishes no throughput numbers — BASELINE.md).  The reference number is
measured once and cached in `BASELINE_MEASURED.json`; delete that file to
re-measure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
LENS = os.path.join(REPO, "lenses/rf50mm.json")
OUR_CKPT = os.path.join(REPO, "ckpt/rf50mm/psfnet_480x640_ks11.msgpack")
# the torch-CPU baseline measurement drives the *reference* weights directly
CKPT = "/root/reference/ckpt/rf50mm/PSFNet480x640_ks11.pkl"
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
H, W, KS, N_STACK = 480, 640, 11, 10


def measure_reference_cpu(n_frames=2):
    """Time the reference renderer (torch CPU): MLP field pred + unfold conv.

    Re-implemented op-for-op from /root/reference/deeplens/render_psf.py:76-127
    + psfnet.py:375-441 rather than imported: importing the reference package
    pulls in cv2/matplotlib/lpips module-level side effects that need stubbing
    (pfmreader.py even executes demo code on import), and the reference's
    device plumbing assumes CUDA.  The math here is the same unfold/mul/fold.
    """
    import torch
    import torch.nn.functional as tF

    sd = torch.load(CKPT, map_location="cpu")
    idxs = sorted({int(k.split(".")[1]) for k in sd if k.endswith(".weight")})

    def mlp(x):
        h = x
        for li, i in enumerate(idxs):
            h = tF.linear(h, sd[f"net.{i}.weight"], sd[f"net.{i}.bias"])
            if li < len(idxs) - 1:
                h = tF.relu(h)
        h = torch.sigmoid(h)
        return tF.normalize(h, p=1, dim=-1)

    def local_render(img, psf, ks):
        b, c, h, w = img.shape
        pad = (ks - 1) // 2
        inp_pad = tF.pad(img, (pad, pad, pad, pad), mode="replicate")
        kernels = psf.reshape(-1, ks, ks)
        kernels_rgb = torch.stack(c * [kernels], 1)
        inp_unf = tF.unfold(inp_pad, (ks, ks))
        x1 = inp_unf.view(b, c, -1, h * w)
        x2 = kernels_rgb.view(b, h * w, c, -1).permute(0, 2, 3, 1)
        y = (x1 * x2).sum(2)
        return tF.fold(y, (h, w), (1, 1))

    rng = np.random.default_rng(0)
    img = torch.tensor(rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32))
    z = torch.tensor(rng.uniform(0, 1, (1, H, W)).astype(np.float32))
    xg, yg = torch.meshgrid(torch.linspace(-1, 1, W), torch.linspace(1, -1, H),
                            indexing="xy")
    field = torch.stack([xg[None].expand(1, H, W), yg[None].expand(1, H, W), z,
                         torch.full_like(z, 0.5)], -1)

    def frame():
        with torch.no_grad():
            psf = mlp(field.reshape(-1, 4)).reshape(1, H, W, KS, KS)
            # patch tiling like local_psf_render_high_res to bound memory
            out = torch.zeros_like(img)
            for i0 in range(0, H, 240):
                for j0 in range(0, W, 320):
                    out[:, :, i0:i0 + 240, j0:j0 + 320] = local_render(
                        img[:, :, i0:i0 + 240, j0:j0 + 320],
                        psf[:, i0:i0 + 240, j0:j0 + 320], KS,
                    )
            return out

    frame()  # warm-up
    t0 = time.perf_counter()
    for _ in range(n_frames):
        frame()
    dt = (time.perf_counter() - t0) / n_frames
    return 1.0 / dt  # frames/sec


def measure_ours(n_reps=int(os.environ.get("AADFF_NREPS", 5)),
                 s_long=int(os.environ.get("AADFF_SLONG", 30))):
    """Measure the production renderer two ways (VERDICT r2 weak #1: a wall
    number on a 1-40 ms/dispatch tunnelled link is not a benchmark):

    * wall_fps — frames/sec of the production workload, one N_STACK-frame
      `render_stack` dispatch per stack (includes the link round trip, i.e.
      what a training loop on THIS machine actually sees);
    * compute_fps — pure device time per frame, from the SLOPE between an
      `s_long`-frame and an N_STACK-frame program:
          ms/frame = (T(s_long) - T(N_STACK)) / (s_long - N_STACK)
      which cancels every fixed per-dispatch cost (link RTT, host overhead)
      exactly, instead of estimating-and-subtracting it.

    Returns a dict; `value` in the driver JSON line is compute_fps.
    """
    import jax.numpy as jnp

    from aadff_tpu.psfnet import PSFNet
    from aadff_tpu.utils.benchmeasure import measure_rtt, slope_rate
    from aadff_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    net = PSFNet(filename=LENS, sensor_res=(H, W), kernel_size=KS)
    net.load_net(OUR_CKPT)

    # link round trip (context: wall_fps - compute_fps gap should match)
    rtt_ms = measure_rtt()

    rng = np.random.default_rng(0)
    depth = jnp.asarray(-rng.uniform(500, 15000, (1, 1, H, W)).astype(np.float32))
    fds = {
        s: jnp.asarray(
            -np.sort(rng.uniform(500, 15000, (1, s)))[:, ::-1].copy(), jnp.float32
        )
        for s in (N_STACK, s_long)
    }
    # distinct inputs per call (the tunnelled TPU platform can cache repeated
    # identical executions, which would inflate the number)
    imgs = [jnp.asarray(rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32))
            for _ in range(n_reps + 2)]

    def run(s, i):
        net.render_stack(imgs[i], depth, fds[s]).block_until_ready()

    detail = {}
    compute_fps, times = slope_rate(run, N_STACK, s_long, n_reps=n_reps,
                                    detail=detail)
    wall_fps = N_STACK / times[N_STACK]
    ms_frame = 1e3 / compute_fps

    # MFU diagnostics (stderr; stdout stays one JSON line).  The MLP holds
    # essentially all the FLOPs: per pixel, 2 * sum(kernel sizes) MACs.
    mlp_macs = sum(
        int(np.prod(np.asarray(w).shape))
        for w, _ in __import__(
            "aadff_tpu.ops.pallas_mlp", fromlist=["flax_mlp_weights"]
        ).flax_mlp_weights(net.variables)
    )
    conv_macs = KS * KS * 3  # per-pixel PSF convolution
    gflop_per_frame = 2 * (mlp_macs + conv_macs) * H * W / 1e9
    tflops = gflop_per_frame * compute_fps / 1e3
    peak = 197.0  # TPU v5e bf16 peak TFLOP/s (scaling-book); MFU vs this
    path = net.render_path()  # single source of truth (psfnet.render_path)
    mfu_pct = 100 * tflops / peak
    print(
        f"[bench] path={path} "
        f"{gflop_per_frame:.1f} GFLOP/frame, device {ms_frame:.2f} ms/frame, "
        f"{tflops:.1f} TFLOP/s achieved, MFU~{mfu_pct:.1f}% of v5e bf16 peak; "
        f"wall {wall_fps:.1f} fps at {rtt_ms:.1f} ms link RTT",
        file=sys.stderr,
    )
    return {
        "compute_fps": round(compute_fps, 2),
        "wall_fps": round(wall_fps, 2),
        "device_ms_per_frame": round(ms_frame, 3),
        "link_roundtrip_ms": round(rtt_ms, 2),
        "mfu_pct_v5e_bf16": round(mfu_pct, 1),
        # IQR of the pairwise-rep slopes as % of the median — the slope rests
        # on a tens-of-ms time delta over a link with multi-ms jitter, so a
        # large spread (>15%) marks the run as unreliable (benchmeasure.py).
        "slope_spread_pct": detail.get("slope_spread_pct"),
    }


def main():
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            ref_fps = json.load(f)["reference_renderer_fps_torch_cpu"]
    else:
        ref_fps = measure_reference_cpu()
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "reference_renderer_fps_torch_cpu": ref_fps,
                    "note": "reference local_psf_render+MLP at 480x640 ks=11, "
                            "torch CPU on this machine (repo publishes no "
                            "throughput numbers)",
                },
                f, indent=2,
            )

    # The tunnelled TPU is single-tenant: if another process (e.g. a chunked
    # training campaign) holds the chip, BACKEND INIT fails outright.  The
    # campaign scripts free the chip for ~150 s between chunks, so retry in
    # a FRESH process (jax backend init is once-per-process) a few times
    # before giving up.  Only a failed device probe takes the retry path —
    # once the backend is up, an exception from measure_ours() is a real bug
    # (missing checkpoint, bad env var, ...) and must surface immediately,
    # not after 4 x 180 s re-execs.
    try:
        import jax

        jax.devices()
    except Exception as e:
        attempt = int(os.environ.get("AADFF_BENCH_ATTEMPT", 0))
        if attempt >= 4:
            raise
        print(f"[bench] device init failed ({e!r}); chip may be "
              f"busy — retry {attempt + 1}/4 in 180 s", file=sys.stderr)
        time.sleep(180)
        os.environ["AADFF_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    m = measure_ours()
    # value = device-time fps (the trustworthy number — the wall number on
    # this tunnelled link varies with session RTT, see measure_ours); the
    # wall fps and RTT ride along so the split is visible in the artifact.
    print(json.dumps({
        "metric": "focal_stack_render_fps_480x640_ks11",
        "value": m["compute_fps"],
        "unit": "frames/sec",
        "vs_baseline": round(m["compute_fps"] / ref_fps, 2),
        **m,
    }))


if __name__ == "__main__":
    main()
