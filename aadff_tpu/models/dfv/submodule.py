"""DFV 3D cost-volume submodules.

Flax port of the reference `DFV_models/submodule.py` (sepConv3dBlock,
projfeat3d, decoderBlock, disparityregression), channels-last NDHWC.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import TorchConv, resize_trilinear


class SepConv3d(nn.Module):
    """conv3d (+BN unless bias) (reference submodule.py:55-61)."""

    features: int
    kernel_size: int = 3
    stride: Tuple[int, int, int] = (1, 1, 1)
    pad: int = 1
    bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel_size,) * 3 if isinstance(self.kernel_size, int) else self.kernel_size
        p = (self.pad,) * 3 if isinstance(self.pad, int) else self.pad
        x = TorchConv(self.features, k, self.stride, p, use_bias=self.bias)(x)
        if not self.bias:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
        return x


class ProjFeat3d(nn.Module):
    """3D->2D projection conv (reference submodule.py:36-51)."""

    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, D, H, W, C = x.shape
        # reference views [b,c,d,h*w] and convs with stride[:2] over (d, h*w)
        h = x.reshape(B, D, H * W, C)
        h = nn.Conv(self.features, (1, 1), strides=self.stride[:2], padding="VALID",
                    use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(h)
        return h.reshape(B, D // self.stride[0], H, W, self.features)


class SepConv3dBlock(nn.Module):
    """Residual separable 3D conv block (reference submodule.py:13-33)."""

    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_feat = x.shape[-1]
        out = nn.relu(SepConv3d(self.features, 3, self.stride, 1)(x, train))
        if in_feat != self.features or self.stride != (1, 1, 1):
            x = ProjFeat3d(self.features, self.stride)(x, train)
        out = nn.relu(x + SepConv3d(self.features, 3, (1, 1, 1), 1)(out, train))
        return out


class DisparityRegression(nn.Module):
    """Softmax-weighted focus-distance regression + uncertainty std
    (reference submodule.py:63-77)."""

    divisor: float = 1.0

    def __call__(self, prob, focal_dist, uncertainty=False):
        # prob: [B, S, H, W] softmaxed over S; focal_dist: [B, S]
        disp = focal_dist[..., None, None]
        out = jnp.sum(prob * disp, axis=1, keepdims=True) * self.divisor
        if uncertainty:
            std = jnp.sqrt(
                jnp.sum(prob * (jax.lax.stop_gradient(out) - disp) ** 2, axis=1,
                        keepdims=True)
            )
            return out, jax.lax.stop_gradient(std)
        return out


class DecoderBlock(nn.Module):
    """3D-conv decoder cascade (reference submodule.py:80-146)."""

    nconvs: int
    channels: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    up: bool = False
    nstride: int = 1
    pool: bool = False

    @nn.compact
    def __call__(self, fvl, train: bool = False):
        strides = [self.stride] * self.nstride + [(1, 1, 1)] * (self.nconvs - self.nstride)
        for i in range(self.nconvs):
            fvl = SepConv3dBlock(self.channels, strides[i])(fvl, train)

        if self.pool:
            fvl_out = fvl
            B, D, H, W, C = fvl.shape
            for i, pool_size in enumerate(np.linspace(1, min(D, H, W) // 2, 4,
                                                      dtype=int)):
                ksz = (int(D / pool_size), int(H / pool_size), int(W / pool_size))
                out = nn.avg_pool(fvl, ksz, strides=ksz, padding="VALID")
                out = SepConv3d(self.channels, 1, (1, 1, 1), 0)(out, train)
                out = resize_trilinear(out, (D, H, W))
                fvl_out = fvl_out + 0.25 * out
            fvl = nn.relu(fvl_out / 2.0)

        def classify(h):
            h = nn.relu(SepConv3d(self.channels, 3, (1, 1, 1), 1)(h, train))
            return SepConv3d(1, 3, (1, 1, 1), 1, bias=True)(h, train)[..., 0]

        def upsample(h):
            B, D, H, W, C = h.shape
            h = resize_trilinear(h, (D, H * 2, W * 2))
            h = SepConv3d(self.channels // 2, 3, (1, 1, 1), 1)(h, train)
            return nn.relu(h)

        # classify always sees channelF features (the reference's eval path for
        # up-blocks returns a degenerate costl that is never consumed; computing
        # the cost before upsampling matches the training semantics and keeps
        # the parameter structure identical across modes)
        costl = classify(fvl)
        if self.up:
            fvl = upsample(fvl)
        return fvl, costl
