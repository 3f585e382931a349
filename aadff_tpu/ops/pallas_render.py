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

Grid: (H/TH, W/TW) tiles, TH=8, TW=128 (one f32 register tile of pixels).
The image stays in HBM (`memory_space=ANY`); each step DMAs its
(TH+ks-1, TW+ks-1) halo into VMEM scratch and overlaps the copy with the
MLP matmuls.

Round-1 status: exact (matches the XLA path to 5e-7) but ~25% slower than
the production path (pallas MLP + XLA tap-scan conv) on v5e — the ks^2
statically-unrolled lane-unaligned VPU loads in the tap loop cost more than
the HBM traffic they save.

Round-2 rework of the tap loop: the ks^2 lane-unaligned reads (each tap read
halo[:, di:di+TH, dj:dj+TW], a lane-rotate per tap) become ks *slab* stages:
for each column shift dj, one lane-shifted slab halo[:, :, dj:dj+TW] is
staged through an aligned scratch buffer, and the ks row shifts inside it are
sublane-offset reads (cheap).  Lane rotations drop ks-fold (121 -> 11).
Matmuls optionally run bf16 (`compute_dtype`), matching the production MLP
kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 8, 128
SUB_PAD, LANE_PAD = 24, 256  # tile-aligned halo staging shapes


def transpose_weights(weights, compute_dtype=jnp.float32):
    """(w [in,out], b [1,out]) pairs -> (wT [out,in] in compute_dtype,
    bT [out,1] in f32)."""
    return tuple(
        (jnp.transpose(w).astype(compute_dtype), jnp.transpose(b))
        for w, b in weights
    )


def _kernel(n_layers: int, ks: int, C: int, compute_dtype, *refs):
    field_ref = refs[0]          # [4, TH, TW] VMEM
    img_ref = refs[1]            # [C, H+ks-1, W+ks-1] HBM/ANY
    w_refs = refs[2 : 2 + 2 * n_layers]
    out_ref = refs[2 + 2 * n_layers]      # [C, TH, TW] VMEM
    halo = refs[3 + 2 * n_layers]         # scratch [C, SUB_PAD, LANE_PAD]
    psf_scratch = refs[4 + 2 * n_layers]  # scratch [ks*ks, TH, TW]
    slab = refs[5 + 2 * n_layers]         # scratch [C, SUB_PAD, TW]
    sem = refs[6 + 2 * n_layers]

    i = pl.program_id(0)
    j = pl.program_id(1)

    # Start the halo DMA; it overlaps with the MLP below.
    # halo scratch is padded to tile-aligned (SUB_PAD, LANE_PAD); only the
    # leading (TH+ks-1, TW+ks-1) region is ever read
    dma = pltpu.make_async_copy(
        img_ref.at[:, pl.ds(i * TH, SUB_PAD), pl.ds(j * TW, LANE_PAD)],
        halo,
        sem,
    )
    dma.start()

    # Feature-major MLP: h [feat, pix]
    h = field_ref[:].reshape(4, TH * TW)
    for li in range(n_layers):
        wT = w_refs[2 * li][:]
        bT = w_refs[2 * li + 1][:]
        h = jnp.dot(wT, h.astype(compute_dtype),
                    preferred_element_type=jnp.float32) + bT
        if li < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    p = jax.nn.sigmoid(h)                          # [ks*ks, TH*TW]
    p = p / (jnp.sum(jnp.abs(p), axis=0, keepdims=True) + 1e-12)
    # stage tap-major PSF tiles in scratch so the tap loop can dynamically
    # index a *ref* (dynamic_slice on values is not lowerable on TPU)
    psf_scratch[:] = p.reshape(ks * ks, TH, TW)

    dma.wait()

    acc = jnp.zeros((C, TH, TW), jnp.float32)
    # slab-staged taps: one lane shift per column offset dj (written through
    # an aligned scratch), then ks sublane-offset row reads inside it
    for dj in range(ks):
        slab[:] = halo[:, :, dj : dj + TW]
        for di in range(ks):
            patch = slab[:, di : di + TH, :]               # [C, TH, TW]
            acc = acc + patch * psf_scratch[di * ks + dj][None]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("ks", "interpret", "compute_dtype"))
def fused_psf_render(field_cf, img_pad, weights_t, ks: int,
                     interpret: bool = False, compute_dtype=jnp.float32):
    """field_cf: [4, H, W] (x, y, z, foc_z channel-first);
    img_pad: [C, H+SUB_PAD-TH, W+LANE_PAD-TW] image, edge-padded by
    (ks-1)//2 and zero-extended to DMA-aligned extents;
    weights_t: transposed MLP weights (kernels may be pre-cast to
    compute_dtype).  Returns [C, H, W].
    """
    _, H, W = field_cf.shape
    C = img_pad.shape[0]
    assert H % TH == 0 and W % TW == 0, (H, W)
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
        functools.partial(_kernel, n_layers, ks, C, compute_dtype),
        grid=(H // TH, W // TW),
        in_specs=[
            pl.BlockSpec((4, TH, TW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((C, TH, TW), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, SUB_PAD, LANE_PAD), jnp.float32),
            pltpu.VMEM((ks * ks, TH, TW), jnp.float32),
            pltpu.VMEM((C, SUB_PAD, TW), jnp.float32),
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
                       compute_dtype=jnp.float32):
    """Full single-frame render [N, C, H, W] via the fused kernel.

    Matches `PSFNet.render` semantics (reference psfnet.py:393-441):
    per-pixel (x, y, z, foc_z) field, MLP PSF prediction, replicate-pad
    per-pixel convolution.
    """
    from .pallas_mlp import flax_mlp_weights  # noqa: PLC0415

    N, C, H, W = img.shape
    pad = (ks - 1) // 2
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
            ((0, 0), (0, SUB_PAD - TH - (ks - 1)), (0, LANE_PAD - TW - (ks - 1))),
        )
        outs.append(fused_psf_render(field, img_pad, weights_t, ks,
                                     interpret=interpret,
                                     compute_dtype=compute_dtype))
    return jnp.stack(outs, axis=0)
