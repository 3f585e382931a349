"""Pallas TPU kernel: fused PSFNet-MLP evaluation over pixel tiles.

The renderer evaluates an 11-layer MLP at every pixel (307k pixels at
480x640).  As a chain of XLA dots, every hidden activation [N_pix, 256]
round-trips through HBM (~3 GB of traffic per frame — the actual bottleneck,
not FLOPs).  This kernel runs the whole chain per 1024-pixel tile with all
activations resident in VMEM; only the 4-float input and the ks^2 output per
pixel touch HBM.

Weights (~2.4 MB f32) are broadcast to every grid step as full VMEM blocks.
Matmuls run on the MXU with f32 accumulation (`preferred_element_type`);
input precision follows the caller's `precision` argument ('default' = fast
bf16 passes, 'highest' = full f32 for parity testing).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024


def flax_mlp_weights(variables) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]:
    """Extract ordered (kernel, bias[1, d]) pairs from our Flax MLP params."""
    dense = variables["params"]
    out = []
    for i in range(len(dense)):
        layer = dense[f"Dense_{i}"]
        out.append((jnp.asarray(layer["kernel"]),
                    jnp.asarray(layer["bias"])[None, :]))
    return tuple(out)


def _kernel(n_layers: int, precision, compute_dtype, *refs):
    field_ref = refs[0]
    w_refs = refs[1 : 1 + 2 * n_layers]
    out_ref = refs[1 + 2 * n_layers]

    # Weights arrive pre-cast to compute_dtype (see mlp_psf_pallas), so the
    # only per-tile cast is the [tile, d] activation.
    h = field_ref[:]
    for li in range(n_layers):
        w = w_refs[2 * li][:]
        b = w_refs[2 * li + 1][:]
        h = jnp.dot(h.astype(compute_dtype), w,
                    preferred_element_type=jnp.float32,
                    precision=precision) + b.astype(jnp.float32)
        if li < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    p = jax.nn.sigmoid(h)
    out_ref[:] = p / (jnp.sum(jnp.abs(p), axis=-1, keepdims=True) + 1e-12)


@functools.partial(
    jax.jit,
    static_argnames=("out_dim", "precision", "interpret", "tile", "compute_dtype"),
)
def mlp_psf_pallas(field, weights, out_dim: int, precision: str = "default",
                   interpret: bool = False, tile: int = TILE,
                   compute_dtype=jnp.float32):
    """field: [N, 4] -> [N, out_dim] PSF rows (sigmoid + L1 normalised).

    Drop-in replacement for `MLP.apply` on flattened pixel fields.
    `compute_dtype=jnp.bfloat16` runs single-pass MXU matmuls with f32
    accumulation (~0.1% output error, below the surrogate's own model error).
    """
    n = field.shape[0]
    n_pad = (-n) % tile
    if n_pad:
        field = jnp.concatenate(
            [field, jnp.zeros((n_pad, field.shape[1]), field.dtype)], axis=0
        )
    n_tiles = field.shape[0] // tile
    n_layers = len(weights)
    # Cast the (tile-invariant) kernels once outside the grid: halves their
    # VMEM footprint under bf16 and removes 2.4 MB of per-tile cast work.
    weights = tuple((w.astype(compute_dtype), b) for w, b in weights)

    flat_w = []
    in_specs = [
        pl.BlockSpec((tile, field.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    for w, b in weights:
        flat_w += [w, b]
        in_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    prec = {"default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[precision]

    out = pl.pallas_call(
        functools.partial(_kernel, n_layers, prec, compute_dtype),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((field.shape[0], out_dim), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * field.shape[0] * sum(
                int(np.prod(w.shape)) for w, _ in weights
            ),
            bytes_accessed=field.shape[0] * (4 + out_dim) * 4,
            transcendentals=field.shape[0] * out_dim,
        ),
    )(field, *flat_w)
    return out[:n]
