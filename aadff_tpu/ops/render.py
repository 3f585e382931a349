"""PSF-convolution renderers.

TPU-native rewrite of `deeplens/render_psf.py`.

`local_psf_render` — per-pixel kernels — is the hot op of the whole framework
(it runs once per focal-stack frame during DFF training).  The reference
materialises an unfold buffer of H*W*ks^2*C floats (render_psf.py:101-107,
~111M floats at 480x640); here the convolution is a `lax.scan` over the ks^2
taps: each step reads one shifted HxW image slice and one PSF tap plane and
fuses a multiply-add.  HBM traffic is one read of the PSF field + ks^2 reads
of the image — no unfold buffer ever exists.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def render_psf(img, psf):
    """Spatially-invariant PSF convolution (reference render_psf.py:12-28).

    img: [B, C, H, W]; psf: [C, ks, ks] -> [B, C, H, W]
    """
    C, ks, _ = psf.shape
    pad = ks // 2
    img_pad = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    # grouped conv: feature_group_count = C, kernel [C, 1, ks, ks] flipped
    kernel = jnp.flip(psf, (-1, -2))[:, None]
    return jax.lax.conv_general_dilated(
        img_pad, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
    )


def render_psf_map(img, psf_map, grid: int):
    """Patch-wise PSF convolution (reference render_psf.py:31-73).

    img: [B, C, H, W]; psf_map: [C, grid*ks, grid*ks]
    """
    Cp, Hp, Wp = psf_map.shape
    assert Hp % grid == 0 and Wp % grid == 0
    ks = Hp // grid
    assert ks % 2 == 1
    B, C, H, W = img.shape
    pad = (ks - 1) // 2
    img_pad = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")

    out = jnp.zeros_like(img)
    ph, pw = H // grid, W // grid
    for i in range(grid):
        for j in range(grid):
            psf = psf_map[:, i * ks : (i + 1) * ks, j * ks : (j + 1) * ks]
            kernel = jnp.flip(psf, (-1, -2))[:, None]
            patch = jax.lax.dynamic_slice(
                img_pad, (0, 0, i * ph, j * pw), (B, C, ph + 2 * pad, pw + 2 * pad)
            )
            rp = jax.lax.conv_general_dilated(
                patch, kernel, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
            )
            out = jax.lax.dynamic_update_slice(out, rp, (0, 0, i * ph, j * pw))
    return out


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def local_psf_render(img, psf, kernel_size: int = 11):
    """Per-pixel PSF convolution (reference render_psf.py:76-107).

    img: [B, C, H, W]; psf: [B, H, W, ks, ks] (kernel shared across channels)
    -> [B, C, H, W]

    out[b,c,y,x] = sum_{i,j} img_pad[b,c,y+i,x+j] * psf[b,y,x,i,j]
    """
    ks = kernel_size
    if img.ndim == 3:
        img = img[None]
    B, C, H, W = img.shape
    pad = (ks - 1) // 2
    img_pad = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    psf_flat = psf.reshape(B, H, W, ks * ks)

    def step(acc, k):
        i, j = k // ks, k % ks
        sl = jax.lax.dynamic_slice(img_pad, (0, 0, i, j), (B, C, H, W))
        tap = jax.lax.dynamic_slice(
            psf_flat, (0, 0, 0, k), (B, H, W, 1)
        )[..., 0]
        return acc + sl * tap[:, None], None

    out, _ = jax.lax.scan(step, jnp.zeros_like(img), jnp.arange(ks * ks))
    return out


def local_psf_render_high_res(img, psf, patch_size=(320, 480), kernel_size: int = 11):
    """Patch-tiled per-pixel rendering (reference render_psf.py:110-127).

    The scan-based `local_psf_render` never materialises the unfold buffer, so
    tiling is rarely needed for memory; kept for API parity and for very large
    sensors.
    """
    B, C, H, W = img.shape
    out = jnp.zeros_like(img)
    for pi in range(int(np.ceil(H / patch_size[0]))):
        for pj in range(int(np.ceil(W / patch_size[1]))):
            lo_i, hi_i = pi * patch_size[0], min((pi + 1) * patch_size[0], H)
            lo_j, hi_j = pj * patch_size[1], min((pj + 1) * patch_size[1], W)
            rp = local_psf_render(
                img[:, :, lo_i:hi_i, lo_j:hi_j],
                psf[:, lo_i:hi_i, lo_j:hi_j],
                kernel_size=kernel_size,
            )
            out = out.at[:, :, lo_i:hi_i, lo_j:hi_j].set(rp)
    return out
