"""Torch-semantics NN building blocks in Flax (NDHWC / NHWC layouts).

The reference DFF models are plain torch Conv3d/BatchNorm/MaxPool stacks.
TPU-native layout is channels-last, and torch's explicit integer padding and
transposed-conv geometry differ from Flax defaults, so these wrappers pin the
exact torch output shapes:  conv: out = (i + 2p - k)//s + 1;
conv_transpose: out = (i - 1)*s - 2p + k.  Verified against torch in
tests/test_models.py.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _tup(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


class TorchConv(nn.Module):
    """Conv with torch-style symmetric integer padding (any spatial rank).

    `dtype` is the computation dtype (params stay f32); pass jnp.bfloat16 for
    the mixed-precision path — the DFF train step is HBM-bound
    (docs/DESIGN.md §9), so halving activation width is the main lever.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = None
    padding: Sequence[int] = None
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n = len(self.kernel_size)
        strides = _tup(self.strides or 1, n)
        pad = _tup(self.padding or 0, n)
        return nn.Conv(
            self.features, tuple(self.kernel_size), strides=strides,
            padding=[(p, p) for p in pad], use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class TorchConvTranspose(nn.Module):
    """Transposed conv with torch geometry: out = (i-1)*s - 2p + k.

    Implemented as input-dilated correlation with a spatially flipped kernel
    (the exact gradient-of-conv definition torch uses).  Kernel is stored as
    [*k, in, out]; a torch weight [in, out, *k] converts via
    transpose(2..,0,1).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = None
    padding: Sequence[int] = None
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = tuple(self.kernel_size)
        n = len(k)
        strides = _tup(self.strides or 1, n)
        pad = _tup(self.padding or 0, n)
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (*k, in_feat, self.features)
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        kernel = jnp.flip(kernel, axis=tuple(range(n)))
        spatial = "DHW"[-n:] if n <= 3 else None
        dn = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,) * n,
            padding=[(kk - 1 - pp, kk - 1 - pp) for kk, pp in zip(k, pad)],
            lhs_dilation=strides, dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y


def torch_max_pool(x, window: Sequence[int], strides: Sequence[int],
                   padding: Sequence[int]):
    """MaxPool with torch symmetric integer padding (pads with -inf)."""
    n = len(window)
    return nn.max_pool(
        x, tuple(window), strides=tuple(strides),
        padding=[(p, p) for p in padding],
    )


def torch_avg_pool(x, window: Sequence[int], strides: Sequence[int]):
    return nn.avg_pool(x, tuple(window), strides=tuple(strides), padding="VALID")


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1)."""

    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9, epsilon=1e-5,
        )(x)


def resize_trilinear(x, size):
    """x: [N, D, H, W, C] -> trilinear resize of (D, H, W) (align_corners=False
    matches torch F.interpolate/Upsample default)."""
    N, D, H, W, C = x.shape
    return jax.image.resize(x, (N, *size, C), method="trilinear")


def resize_bilinear(x, size):
    """x: [N, H, W, C] -> bilinear resize (align_corners=False)."""
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, *size, C), method="bilinear")


def upsample_nearest(x, scale: int):
    """Nearest-neighbour spatial upsample on the middle dims of NHWC/NDHWC."""
    spatial = x.shape[1:-1]
    new = tuple(s * scale for s in spatial)
    return jax.image.resize(x, (x.shape[0], *new, x.shape[-1]), method="nearest")
