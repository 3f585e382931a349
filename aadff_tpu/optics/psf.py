"""PSF computation: pupil-sampled ray tracing + Monte-Carlo rasterisation.

TPU-native rewrite of `deeplens/monte_carlo.py` and the PSF paths of
`deeplens/optics.py:808-1065`.

The reference rasterises ray hits with a per-point Python loop around
`index_put_(accumulate=True)` (monte_carlo.py:46-55).  Scatter with a random
access pattern is the worst case for a TPU, so here the bilinear splat is
reformulated as a dense contraction: each ray's bilinear footprint along rows /
columns is a hat function `max(0, 1 - |p - i|)` evaluated on the kernel grid,
and the PSF is `einsum('sr,sc->rc', W_row * ra, W_col)` — a [ks, spp] @
[spp, ks] matmul on the MXU.  Deterministic, fully batched over points and
wavelengths, no scatter.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DEFAULT_WAVE, EPSILON, GEO_SPP, WAVE_RGB
from .rays import RayBundle, make_rays, propagate_to


# --------------------------------------------------------------------------
# Rasterisation (reference monte_carlo.py:9-121)
# --------------------------------------------------------------------------
def _hat_weights(pif, ks: int):
    """Bilinear footprint of float index `pif` [...,] on grid 0..ks-1 -> [..., ks]."""
    grid = jnp.arange(ks, dtype=pif.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pif[..., None] - grid))


def assign_points_to_pixels(points, ks: int, x_range, y_range, ra,
                            coherent: bool = False, phase=None):
    """Splat points [spp, 2] into a [ks, ks] grid with bilinear weights.

    Matches reference monte_carlo.py:60-121 (interpolate=True), expressed as a
    matmul instead of scatter-add.
    """
    x_min, x_max = x_range
    y_min, y_max = y_range
    row = (points[..., 1] - y_max) / (y_min - y_max) * (ks - 1)
    col = (points[..., 0] - x_min) / (x_max - x_min) * (ks - 1)
    wr = _hat_weights(row, ks)  # [spp, ks]
    wc = _hat_weights(col, ks)
    if coherent:
        amp = ra * jnp.exp(1j * phase)
        return jnp.einsum("sr,sc->rc", wr * amp[..., None], wc.astype(amp.dtype))
    return jnp.einsum(
        "sr,sc->rc", wr * ra[..., None], wc, preferred_element_type=jnp.float32, precision='highest'
    )


def forward_integral(ray: RayBundle, ps: float, ks: int, pointc_ref=None):
    """Monte-Carlo PSF integral (reference monte_carlo.py:9-57).

    ray.o: [spp, N, 3] (or [spp, 3]); returns [N, ks, ks] (or [ks, ks]).
    Batched over N in one einsum — no Python loop over points.
    """
    single_point = ray.o.ndim == 2
    points = -ray.o[..., :2]
    psf_range = ((-ks / 2 + 0.5) * ps, (ks / 2 - 0.5) * ps)

    if pointc_ref is None:
        pointc = jnp.sum(points * ray.ra[..., None], axis=0) / (
            jnp.sum(ray.ra[..., None], axis=0) + EPSILON
        )
        points_shift = points - pointc
    else:
        points_shift = points - pointc_ref

    ra = (
        ray.ra
        * (jnp.abs(points_shift[..., 0]) < (psf_range[1] - 0.01 * ps))
        * (jnp.abs(points_shift[..., 1]) < (psf_range[1] - 0.01 * ps))
    )
    points_shift = points_shift * ra[..., None]

    row = (points_shift[..., 1] - psf_range[1]) / (psf_range[0] - psf_range[1]) * (ks - 1)
    col = (points_shift[..., 0] - psf_range[0]) / (psf_range[1] - psf_range[0]) * (ks - 1)
    wr = _hat_weights(row, ks)  # [spp, N, ks] or [spp, ks]
    wc = _hat_weights(col, ks)
    if single_point:
        return jnp.einsum("sr,sc->rc", wr * ra[..., None], wc,
                          preferred_element_type=jnp.float32, precision='highest')
    return jnp.einsum("snr,snc->nrc", wr * ra[..., None], wc,
                      preferred_element_type=jnp.float32, precision='highest')


# --------------------------------------------------------------------------
# Point grids (reference optics.py:813-884)
# --------------------------------------------------------------------------
def point_source_grid(depth, grid=9, normalized=True, quater=False, center=False,
                      scale=1.0, sensor_size=None):
    if grid == 1:
        x = y = np.asarray([[0.0]], np.float32)
        assert not quater
    elif center:
        half_bin = 1 / 2 / (grid - 1)
        x, y = np.meshgrid(
            np.linspace(-1 + half_bin, 1 - half_bin, grid),
            np.linspace(1 - half_bin, -1 + half_bin, grid),
            indexing="xy",
        )
    else:
        x, y = np.meshgrid(
            np.linspace(-0.98, 0.98, grid),
            np.linspace(0.98, -0.98, grid),
            indexing="xy",
        )
    z = np.full((grid, grid), depth, np.float32)
    pts = np.stack([x, y, z], axis=-1).astype(np.float32)
    if quater:
        bi = grid // 2 if grid % 2 == 0 else grid // 2 + 1
        pts = pts[0:bi, grid // 2 :, :]
    if not normalized:
        pts[..., 0] *= scale * sensor_size[0] / 2
        pts[..., 1] *= scale * sensor_size[1] / 2
    return pts


def point_source_radial(depth, grid=9, center=False):
    if grid == 1:
        x = np.asarray([0.0], np.float32)
    elif center:
        half_bin = 1 / 2 / (grid - 1)
        x = np.linspace(0, 1 - half_bin, grid, dtype=np.float32)
    else:
        x = np.linspace(0, 0.98, grid, dtype=np.float32)
    z = np.full_like(x, depth)
    return np.stack([x, x, z], axis=-1)


# --------------------------------------------------------------------------
# Jitted PSF pipeline
# --------------------------------------------------------------------------
@functools.partial(
    jax.jit,
    static_argnames=("metas", "ks", "spp", "wvln", "center", "lens_range"),
)
def _psf_impl(params, metas, points, key, ks, spp, wvln, center, lens_range,
              d_sensor, pupilz, pupilr, hfov, r_last, sensor_w, sensor_h,
              pixel_size):
    """points: [N, 3] normalized (x, y in [-1,1], z<0 in mm) -> [N, ks, ks]."""
    from .lens import _trace_impl

    depth = points[:, 2]
    scale = -depth * jnp.tan(hfov) / r_last
    point_obj = jnp.stack(
        [
            points[:, 0] * scale * sensor_w / 2,
            points[:, 1] * scale * sensor_h / 2,
            depth,
        ],
        axis=-1,
    )

    k_psf, k_chief = jax.random.split(key)

    def sample_and_trace(k, pupil_r, n_rays):
        k1, k2 = jax.random.split(k)
        theta = jax.random.uniform(k1, (n_rays,)) * 2 * np.pi
        r = jnp.sqrt(jax.random.uniform(k2, (n_rays,)) * pupil_r**2)
        o2 = jnp.stack(
            [r * jnp.cos(theta), r * jnp.sin(theta), jnp.full_like(theta, pupilz)],
            axis=1,
        )
        o = jnp.broadcast_to(point_obj[None], (n_rays,) + point_obj.shape)
        d = o2[:, None, :] - o
        ray = make_rays(o, d)
        ray, _ = _trace_impl(ray, params, metas, wvln, True, False, lens_range, False)
        return propagate_to(ray, d_sensor)

    ray = sample_and_trace(k_psf, pupilr, spp)

    if center:
        # chief-ray PSF center via shrunk pupil (reference optics.py:887-913)
        chief = sample_and_trace(k_chief, pupilr * 0.5, GEO_SPP)
        pc = jnp.sum(chief.o * chief.ra[..., None], axis=0) / (
            jnp.sum(chief.ra[..., None], axis=0) + EPSILON
        )
        pointc = -pc[..., :2]
    else:
        pointc = jnp.stack(
            [points[:, 0] * sensor_w / 2, points[:, 1] * sensor_h / 2], axis=-1
        )

    psf = forward_integral(ray, ps=pixel_size, ks=ks, pointc_ref=pointc)
    # Guarded normalization: at extreme points (e.g. depth at the -200 mm
    # near bound) every ray can miss the ks-window or the aperture, making
    # the sum 0 — the reference's bare divide (optics.py:978) returns NaN
    # there; an all-zero kernel is the sane in-graph answer.
    psf = psf / jnp.maximum(jnp.sum(psf, axis=(-1, -2), keepdims=True), EPSILON)
    return psf


def lens_psf(lens, points, ks=31, wvln=DEFAULT_WAVE, spp=GEO_SPP, center=True,
             key=None):
    """[N, 3] normalized points -> [N, ks, ks] PSFs (reference optics.py:915-983)."""
    key = lens.next_key() if key is None else key
    points = jnp.asarray(points, jnp.float32)
    single = points.ndim == 1
    if single:
        points = points[None]
    pupilz, pupilr = lens.entrance_pupil()
    psf = _psf_impl(
        lens.params, lens.metas, points, key,
        int(ks), int(spp), float(wvln), bool(center),
        tuple(range(len(lens.metas))),
        jnp.float32(lens.d_sensor), jnp.float32(pupilz), jnp.float32(pupilr),
        jnp.float32(lens.hfov), jnp.float32(lens.r_last),
        jnp.float32(lens.sensor_size[1]), jnp.float32(lens.sensor_size[0]),
        jnp.float32(lens.pixel_size),
    )
    return psf[0] if single else psf


def lens_psf_rgb(lens, points, ks=31, spp=GEO_SPP, center=True, key=None):
    """[N, 3] -> [N, 3, ks, ks] RGB PSF (reference optics.py:986-1003)."""
    key = lens.next_key() if key is None else key
    keys = jax.random.split(key, 3)
    psfs = [
        lens_psf(lens, points, ks=ks, wvln=w, spp=spp, center=center, key=k)
        for w, k in zip(WAVE_RGB, keys)
    ]
    return jnp.stack(psfs, axis=-3)


def make_grid_psf(psfs, nrow: int):
    """[N, C, ks, ks] -> [C, rows*ks, nrow*ks] tiling (torchvision.make_grid
    with padding=0 equivalent)."""
    n, c, ks, _ = psfs.shape
    ncol = nrow
    nrows = int(math.ceil(n / ncol))
    pad = nrows * ncol - n
    if pad:
        psfs = jnp.concatenate([psfs, jnp.zeros((pad, c, ks, ks), psfs.dtype)])
    psfs = psfs.reshape(nrows, ncol, c, ks, ks)
    psfs = jnp.transpose(psfs, (2, 0, 3, 1, 4))
    return psfs.reshape(c, nrows * ks, ncol * ks)


def lens_psf_map(lens, depth=None, grid=7, ks=51, spp=GEO_SPP, center=True,
                 key=None):
    """RGB PSF map [3, grid*ks, grid*ks] (reference optics.py:1006-1026)."""
    from ..constants import DEPTH

    depth = DEPTH if depth is None else depth
    pts = point_source_grid(depth=depth, grid=grid).reshape(-1, 3)
    psfs = lens_psf_rgb(lens, pts, ks=ks, spp=spp, center=center, key=key)
    return make_grid_psf(psfs, nrow=grid)


def psf2mtf(psf, pixel_size: float):
    """PSF -> (freq, tangential MTF, sagittal MTF) (reference optics.py:1028-1065)."""
    psf = np.asarray(psf)
    cy, cx = psf.shape[0] // 2, psf.shape[1] // 2
    sagittal = psf[cy, :]
    tangential = psf[:, cx]
    mtf_s = np.abs(np.fft.fft(sagittal))
    mtf_t = np.abs(np.fft.fft(tangential))
    mtf_s /= mtf_s.max()
    mtf_t /= mtf_t.max()
    freq = np.fft.fftfreq(psf.shape[0], pixel_size)
    pos = freq > 0
    return freq[pos], mtf_t[pos], mtf_s[pos]
