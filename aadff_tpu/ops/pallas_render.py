"""Pallas TPU kernel: fully-fused per-pixel PSF render.

Fuses the whole hot path of `PSFNet.render` into one kernel per spatial tile:

    field tile -> 11-layer MLP -> per-pixel [ks, ks] PSFs -> per-pixel
    convolution against an image halo -> output tile

Nothing but the 4-float field, the image halo, and the 3-float output pixel
ever touches HBM — the [H, W, ks^2] PSF field (150 MB/frame at 480x640) and
all MLP activations (~3 GB/frame as XLA dots) exist only in VMEM.

Layout trick: the MLP runs feature-major (`h = W^T @ h`, features in
sublanes, pixels in lanes) so the final layer directly yields
`psf[tap, pixel]`; tap rows then drive the tap-loop of the convolution
without any per-tap relayout.

Grid: (H/th, W/tw) tiles; the pixel batch per grid step is th*tw.  The image
stays in HBM (`memory_space=ANY`); each step DMAs its (th+ks-1, tw+ks-1)
halo into VMEM scratch and overlaps the copy with the MLP matmuls.

Round-1 status: exact (matches the XLA path to 5e-7) but ~25% slower than
the production path (pallas MLP + XLA tap-scan conv) on v5e — the ks^2
statically-unrolled lane-unaligned VPU loads in the tap loop cost more than
the HBM traffic they save.

Round-2 rework of the tap loop: the ks^2 lane-unaligned reads (each tap read
halo[:, di:di+th, dj:dj+tw], a lane-rotate per tap) become ks *slab* stages:
for each column shift dj, one lane-shifted slab halo[:, :, dj:dj+tw] is
staged through an aligned scratch buffer, and the ks row shifts inside it are
sublane-offset reads (cheap).  Lane rotations drop ks-fold (121 -> 11).

Round-3: tile shape (th, tw) is a parameter so the per-matmul pixel batch
can be widened beyond 1024 (fewer grid steps amortise the per-step fixed
work — sigmoid/normalise VPU ops, DMA waits, grid bookkeeping — over more
MXU FLOPs).  Measured on v5e at 480x640 (docs/kernel_sweep.jsonl, dispatch-
overhead-free slope method): (32, 128) f32 = 1.91 ms/frame = ~94% of the
MXU's bf16 speed-of-light for the MLP chain (XLA Precision.DEFAULT already
runs f32 matmuls as single-pass bf16, so an explicit `compute_dtype=bf16`
only adds VPU cast work).  Decomposition: MLP 1.65 ms + conv/DMA 0.26 ms,
additive; interleaving two half-batch chains (`pipe=True`) is a measured
negative result (2.09 ms).  See docs/DESIGN.md §4.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Production tile shape (pixels per grid step = TH * TW).  The r3 sweep
# (docs/kernel_sweep.jsonl, slope method) measured 2.54 / 2.2 / 1.91
# ms/frame at th = 8 / 16 / 32 (480x640, ks=11): bigger pixel batches
# amortise the per-step fixed work.  PSFNet auto-picks the largest of
# 32/16/8 dividing the sensor height.
TH, TW = 32, 128


def fused_tile_height(h: int, w: int):
    """Tile height the fused kernel uses for an (h, w) frame, or None when
    the extents aren't tile-aligned (callers fall back to the two-stage
    MLP+scan path).  Single source of truth for fused-path eligibility —
    PSFNet's render dispatch and bench.py's path label both use it."""
    th = next((t for t in (32, 16, 8) if h % t == 0), None)
    return th if (th is not None and w % TW == 0) else None


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def halo_pads(ks: int, th: int, tw: int):
    """Tile-aligned halo staging extents for a (th, tw) tile: the DMA source
    region per step is (th+ks-1, tw+ks-1), padded up to (sublane, lane)
    alignment so the copy and the staged reads stay aligned."""
    return _round_up(th + ks - 1, 8), _round_up(tw + ks - 1, 128)


def transpose_weights(weights, compute_dtype=jnp.float32):
    """(w [in,out], b [1,out]) pairs -> (wT [out,in] in compute_dtype,
    bT [out,1] in f32)."""
    return tuple(
        (jnp.transpose(w).astype(compute_dtype), jnp.transpose(b))
        for w, b in weights
    )


def _kernel(n_layers: int, ks: int, C: int, compute_dtype, th: int, tw: int,
            sub_pad: int, mode: str, pipe: bool, stacked: bool,
            interpret: bool, *refs):
    """mode/pipe are DIAGNOSTIC knobs for scripts/bench_fused_kernel.py
    (production is mode='full', pipe=False):
      mode='mlponly'  — skip halo DMA + tap conv (isolates MLP time)
      mode='convonly' — replace the MLP with a cheap broadcast (isolates
                        DMA + sigmoid-free tap-conv time)
      pipe=True       — run the MLP as two interleaved half-pixel-batch
                        chains, giving Mosaic independent matmuls to overlap
                        VPU work (casts/relu) of one chain with MXU time of
                        the other (VERDICT r2 #1b pipelining experiment)."""
    field_ref = refs[0]          # [4, th, tw] VMEM
    img_ref = refs[1]            # [C, H+sub_pad-th, W+lane_pad-tw] HBM/ANY
    w_refs = refs[2 : 2 + 2 * n_layers]
    out_ref = refs[2 + 2 * n_layers]      # [C, th, tw] VMEM
    halo = refs[3 + 2 * n_layers]         # scratch [C, sub_pad, lane_pad]
    psf_scratch = refs[4 + 2 * n_layers]  # scratch [ks*ks, th, tw]
    slab = refs[5 + 2 * n_layers]         # scratch [C, sub_pad, tw]
    sem = refs[6 + 2 * n_layers]

    i = pl.program_id(0)
    j = pl.program_id(1)
    # stacked mode: grid (H/th, W/tw, S) with the stack index s innermost.
    # The image halo for tile (i, j) is identical for every frame s (only
    # the field's foc_z channel varies), and VMEM scratch persists across
    # sequential grid steps — so the halo is DMA'd once per tile (s == 0)
    # and reused for the remaining S-1 frames.
    s = pl.program_id(2) if stacked else None

    if mode != "mlponly":
        # Start the halo DMA; it overlaps with the MLP below.
        # halo scratch is padded to tile-aligned (sub_pad, lane_pad); only the
        # leading (th+ks-1, tw+ks-1) region is ever read
        lane_pad = halo.shape[-1]
        dma = pltpu.make_async_copy(
            img_ref.at[:, pl.ds(i * th, sub_pad), pl.ds(j * tw, lane_pad)],
            halo,
            sem,
        )
        if stacked:
            @pl.when(s == 0)
            def _start_halo_dma():
                dma.start()
        else:
            dma.start()

    def mlp_chain(h):
        for li in range(n_layers):
            wT = w_refs[2 * li][:]
            bT = w_refs[2 * li + 1][:]
            hc = h.astype(compute_dtype)
            if interpret and compute_dtype != jnp.float32:
                # CPU interpret mode can't execute bf16xbf16->f32 dots;
                # rounding inputs to bf16 then multiplying in f32 is the
                # same arithmetic the MXU's single bf16 pass performs
                wT, hc = wT.astype(jnp.float32), hc.astype(jnp.float32)
            h = jnp.dot(wT, hc, preferred_element_type=jnp.float32) + bT
            if li < n_layers - 1:
                h = jnp.maximum(h, 0.0)
        return h

    # Feature-major MLP: h [feat, pix]
    h0 = field_ref[:].reshape(4, th * tw)
    if mode == "convonly":
        # no MLP, no sigmoid: p is a cheap field-dependent broadcast
        p = jnp.broadcast_to(h0[2:3] * 0.01, (ks * ks, th * tw))
    else:
        if pipe:
            half = (th * tw) // 2
            h = jnp.concatenate(
                [mlp_chain(h0[:, :half]), mlp_chain(h0[:, half:])], axis=1
            )
        else:
            h = mlp_chain(h0)
        p = jax.nn.sigmoid(h)                          # [ks*ks, th*tw]
        p = p / (jnp.sum(jnp.abs(p), axis=0, keepdims=True) + 1e-12)

    if mode == "mlponly":
        first = p.reshape(ks * ks, th, tw)[:C]
        out_ref[:] = first[None] if stacked else first
        return

    # stage tap-major PSF tiles in scratch so the tap loop can dynamically
    # index a *ref* (dynamic_slice on values is not lowerable on TPU)
    psf_scratch[:] = p.reshape(ks * ks, th, tw)

    if stacked:
        @pl.when(s == 0)
        def _wait_halo_dma():
            dma.wait()
    else:
        dma.wait()

    acc = jnp.zeros((C, th, tw), jnp.float32)
    # slab-staged taps: one lane shift per column offset dj (written through
    # an aligned scratch), then ks sublane-offset row reads inside it
    for dj in range(ks):
        slab[:] = halo[:, :, dj : dj + tw]
        for di in range(ks):
            patch = slab[:, di : di + th, :]               # [C, th, tw]
            acc = acc + patch * psf_scratch[di * ks + dj][None]
    out_ref[:] = acc[None] if stacked else acc


@functools.partial(jax.jit, static_argnames=("ks", "interpret", "compute_dtype",
                                             "th", "tw", "mode", "pipe"))
def fused_psf_render(field_cf, img_pad, weights_t, ks: int,
                     interpret: bool = False, compute_dtype=jnp.float32,
                     th: int = TH, tw: int = TW, mode: str = "full",
                     pipe: bool = False):
    """field_cf: [4, H, W] (x, y, z, foc_z channel-first);
    img_pad: [C, H+sub_pad-th, W+lane_pad-tw] image, edge-padded by
    (ks-1)//2 and zero-extended to DMA-aligned extents (see `halo_pads`);
    weights_t: transposed MLP weights (kernels may be pre-cast to
    compute_dtype).  Returns [C, H, W].
    """
    _, H, W = field_cf.shape
    C = img_pad.shape[0]
    assert H % th == 0 and W % tw == 0, (H, W, th, tw)
    sub_pad, lane_pad = halo_pads(ks, th, tw)
    n_layers = len(weights_t)
    weights_t = tuple((w.astype(compute_dtype), b) for w, b in weights_t)

    flat_w, w_specs = [], []
    for wT, bT in weights_t:
        flat_w += [wT, bT]
        w_specs += [
            pl.BlockSpec(wT.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bT.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ]

    return pl.pallas_call(
        functools.partial(_kernel, n_layers, ks, C, compute_dtype, th, tw,
                          sub_pad, mode, pipe, False, interpret),
        grid=(H // th, W // tw),
        in_specs=[
            pl.BlockSpec((4, th, tw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((C, th, tw), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, sub_pad, lane_pad), jnp.float32),
            pltpu.VMEM((ks * ks, th, tw), jnp.float32),
            pltpu.VMEM((C, sub_pad, tw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * H * W * sum(int(np.prod(w.shape)) for w, _ in weights_t)
            + 2 * H * W * ks * ks * C,
            bytes_accessed=(4 + 2 * C) * H * W * 4,
            transcendentals=H * W * ks * ks,
        ),
    )(field_cf, img_pad, *flat_w)


def fused_render_frame(variables, img, depth, foc_dist, ks: int,
                       d_min: float, d_max: float, interpret: bool = False,
                       compute_dtype=jnp.float32, th: int = TH, tw: int = TW,
                       mode: str = "full", pipe: bool = False):
    """Full single-frame render [N, C, H, W] via the fused kernel.

    Matches `PSFNet.render` semantics (reference psfnet.py:393-441):
    per-pixel (x, y, z, foc_z) field, MLP PSF prediction, replicate-pad
    per-pixel convolution.
    """
    from .pallas_mlp import flax_mlp_weights  # noqa: PLC0415

    N, C, H, W = img.shape
    pad = (ks - 1) // 2
    sub_pad, lane_pad = halo_pads(ks, th, tw)
    weights_t = transpose_weights(flax_mlp_weights(variables))

    z = jnp.clip((depth.reshape(N, H, W) - d_min) / (d_max - d_min), 0.0, 1.0)
    x, y = jnp.meshgrid(jnp.linspace(-1, 1, W), jnp.linspace(1, -1, H),
                        indexing="xy")
    foc_z = jnp.clip((foc_dist[:, None, None] - d_min) / (d_max - d_min), 0.0, 1.0)

    outs = []
    for n in range(N):
        field = jnp.stack(
            [x, y, z[n], jnp.broadcast_to(foc_z[n], (H, W))], axis=0
        )
        img_pad = jnp.pad(img[n], ((0, 0), (pad, pad), (pad, pad)), mode="edge")
        img_pad = jnp.pad(
            img_pad,
            ((0, 0), (0, sub_pad - th - (ks - 1)), (0, lane_pad - tw - (ks - 1))),
        )
        outs.append(fused_psf_render(field, img_pad, weights_t, ks,
                                     interpret=interpret,
                                     compute_dtype=compute_dtype,
                                     th=th, tw=tw, mode=mode, pipe=pipe))
    return jnp.stack(outs, axis=0)


@functools.partial(jax.jit, static_argnames=("ks", "interpret", "compute_dtype",
                                             "th", "tw", "dim_semantics"))
def fused_psf_render_stack(field_scf, img_pad, weights_t, ks: int,
                           interpret: bool = False,
                           compute_dtype=jnp.float32,
                           th: int = TH, tw: int = TW,
                           dim_semantics=("arbitrary", "arbitrary",
                                          "arbitrary")):
    """Whole-focal-stack variant of `fused_psf_render`: one kernel launch
    for all S frames of one image.

    field_scf: [S, 4, H, W] per-frame fields (only the foc_z channel varies
    across S); img_pad as in `fused_psf_render` (shared by every frame).
    Returns [S, C, H, W].

    Grid is (H/th, W/tw, S) with the frame index innermost, so for each
    spatial tile the halo is DMA'd from HBM once (s == 0) and the remaining
    S-1 frames reuse it from VMEM scratch — S-fold less image traffic than
    `lax.map` over `fused_psf_render`, and no per-frame XLA glue between
    kernel launches.

    `dim_semantics` controls the grid annotation: the default all-arbitrary
    grid is fully sequential; ("parallel", "parallel", "arbitrary") keeps
    only the scratch-reuse dependency (halo written at s == 0, read at
    s > 0, always within one (i, j) tile) sequential and lets Mosaic
    pipeline blocks across the independent spatial tiles — the r3 verdict's
    suggested fix for the all-arbitrary grid defeating cross-iteration
    pipelining.
    """
    S, _, H, W = field_scf.shape
    C = img_pad.shape[0]
    assert H % th == 0 and W % tw == 0, (H, W, th, tw)
    sub_pad, lane_pad = halo_pads(ks, th, tw)
    n_layers = len(weights_t)
    weights_t = tuple((w.astype(compute_dtype), b) for w, b in weights_t)

    flat_w, w_specs = [], []
    for wT, bT in weights_t:
        flat_w += [wT, bT]
        w_specs += [
            pl.BlockSpec(wT.shape, lambda i, j, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bT.shape, lambda i, j, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    return pl.pallas_call(
        functools.partial(_kernel, n_layers, ks, C, compute_dtype, th, tw,
                          sub_pad, "full", False, True, interpret),
        grid=(H // th, W // tw, S),
        in_specs=[
            pl.BlockSpec((1, 4, th, tw), lambda i, j, s: (s, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, C, th, tw), lambda i, j, s: (s, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, C, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, sub_pad, lane_pad), jnp.float32),
            pltpu.VMEM((ks * ks, th, tw), jnp.float32),
            pltpu.VMEM((C, sub_pad, tw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=tuple(dim_semantics),
        ),
        cost_estimate=pl.CostEstimate(
            flops=S * (2 * H * W * sum(int(np.prod(w.shape))
                                       for w, _ in weights_t)
                       + 2 * H * W * ks * ks * C),
            bytes_accessed=(S * 4 + 2 * C + S * C) * H * W * 4,
            transcendentals=S * H * W * ks * ks,
        ),
    )(field_scf, img_pad, *flat_w)


def fused_render_stack(variables, img, depth, focus_dists, ks: int,
                       d_min: float, d_max: float, interpret: bool = False,
                       compute_dtype=jnp.float32, th: int = TH, tw: int = TW,
                       dim_semantics=("parallel", "parallel", "arbitrary")):
    """Full focal-stack render [N, C, H, W] + [N, S] -> [N, S, C, H, W] via
    one `fused_psf_render_stack` launch per batch element.

    The default grid annotation marks the two spatial dims "parallel" so
    Mosaic pipelines blocks across tiles; only the frame dim (whose halo
    scratch is reused across S) stays "arbitrary".  Measured 1.763 ms/frame
    vs 2.392 for the all-arbitrary grid and 2.388 for per-frame launches
    (docs/kernel_sweep.jsonl, 2026-08-19 same-session slope A/B).

    Matches `PSFNet.render_stack` semantics (reference renders the stack as
    a Python loop over `PSFNet.render`, 2_aber_aware_dff_aif.py:100-116).
    """
    from .pallas_mlp import flax_mlp_weights  # noqa: PLC0415

    N, C, H, W = img.shape
    S = focus_dists.shape[1]
    pad = (ks - 1) // 2
    sub_pad, lane_pad = halo_pads(ks, th, tw)
    weights_t = transpose_weights(flax_mlp_weights(variables))

    z = jnp.clip((depth.reshape(N, H, W) - d_min) / (d_max - d_min), 0.0, 1.0)
    x, y = jnp.meshgrid(jnp.linspace(-1, 1, W), jnp.linspace(1, -1, H),
                        indexing="xy")
    foc_z = jnp.clip((focus_dists - d_min) / (d_max - d_min), 0.0, 1.0)  # [N,S]

    outs = []
    for n in range(N):
        xyz = jnp.stack([x, y, z[n]], axis=0)                  # [3, H, W]
        field = jnp.concatenate(
            [jnp.broadcast_to(xyz[None], (S, 3, H, W)),
             jnp.broadcast_to(foc_z[n][:, None, None, None], (S, 1, H, W))],
            axis=1,
        )
        img_pad = jnp.pad(img[n], ((0, 0), (pad, pad), (pad, pad)), mode="edge")
        img_pad = jnp.pad(
            img_pad,
            ((0, 0), (0, sub_pad - th - (ks - 1)), (0, lane_pad - tw - (ks - 1))),
        )
        outs.append(fused_psf_render_stack(field, img_pad, weights_t, ks,
                                           interpret=interpret,
                                           compute_dtype=compute_dtype,
                                           th=th, tw=tw,
                                           dim_semantics=tuple(dim_semantics)))
    return jnp.stack(outs, axis=0)
