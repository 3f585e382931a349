"""Depth and all-in-focus image metrics.

Numpy port of `dff/metrics.py` from the reference.  PSNR/SSIM are implemented
directly (skimage is not available in this environment): PSNR follows
`skimage.metrics.peak_signal_noise_ratio`, SSIM follows
`skimage.metrics.structural_similarity` defaults (uniform 7x7 window,
K1=0.01, K2=0.03) which is what the reference calls with uint8 inputs
(reference dff/metrics.py:134-158).
"""
from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


# ================================
# Masked depth metrics (reference dff/metrics.py:89-131)
# ================================
def mask_abs_rel(est_depth, gt_depth, mask):
    return np.mean(np.abs(gt_depth[mask] - est_depth[mask]) / gt_depth[mask])


def mask_sq_rel(est_depth, gt_depth, mask):
    return np.mean(np.power(gt_depth[mask] - est_depth[mask], 2) / gt_depth[mask])


def mask_mse(est_depth, gt_depth, mask):
    return np.mean(np.power(gt_depth[mask] - est_depth[mask], 2))


def mask_mae(est_depth, gt_depth, mask):
    return np.mean(np.abs(gt_depth[mask] - est_depth[mask]))


def mask_rmse(est_depth, gt_depth, mask):
    return np.sqrt(np.mean(np.power(est_depth[mask] - gt_depth[mask], 2)))


def mask_rmse_log(est_depth, gt_depth, mask):
    gt = np.log(gt_depth[mask])
    est = np.log(est_depth[mask])
    return np.sqrt(np.mean(np.power(gt - est, 2)))


def mask_accuracy_k(est_depth, gt_depth, k, mask):
    a = est_depth[mask] / gt_depth[mask]
    b = gt_depth[mask] / est_depth[mask]
    thresh = np.maximum(a, b)
    return np.sum(np.where(thresh < 1.25**k, 1, 0)) / np.sum(mask)


def mask_mse_w_conf(est_depth, gt_depth, conf, mask):
    return np.sum(conf[mask] * np.power(gt_depth[mask] - est_depth[mask], 2)) / np.sum(
        conf[mask]
    )


def mask_mae_w_conf(est_depth, gt_depth, conf, mask):
    return np.sum(conf[mask] * np.abs(gt_depth[mask] - est_depth[mask])) / np.sum(
        conf[mask]
    )


# ================================
# Unmasked variants (reference dff/metrics.py:10-44)
# ================================
def abs_rel(est_depth, gt_depth):
    out = np.abs(gt_depth - est_depth) / gt_depth
    total = np.count_nonzero(~np.isinf(out))
    out = np.where(np.isinf(out), 0, out)
    return np.sum(out) / total


def sq_rel(est_depth, gt_depth):
    out = np.power(gt_depth - est_depth, 2) / gt_depth
    total = np.count_nonzero(~np.isinf(out))
    out = np.where(np.isinf(out), 0, out)
    return np.sum(out) / total


def mae(est_depth, gt_depth):
    return np.mean(np.abs(gt_depth - est_depth))


def mse(est_depth, gt_depth):
    return np.mean(np.power(gt_depth - est_depth, 2))


def rmse(est_depth, gt_depth):
    return np.sqrt(mse(est_depth, gt_depth))


def rmse_log(est_depth, gt_depth):
    gt, est = np.log(gt_depth), np.log(est_depth)
    total = np.count_nonzero((~np.isinf(est)) * (~np.isinf(gt)))
    out = np.power(gt - est, 2)
    out = np.where(np.isinf(out), 0, out)
    return np.sqrt(np.sum(out) / total)


def accuracy_k(est_depth, gt_depth, k):
    thresh = np.maximum(est_depth / gt_depth, gt_depth / est_depth)
    total = np.count_nonzero(~np.isinf(thresh))
    return np.sum(np.where(thresh < 1.25**k, 1, 0)) / total


# ================================
# Bumpiness (reference dff/metrics.py:45-81)
# ================================
def _scharr_v(img):
    kx = np.array([[3, 0, -3], [10, 0, -10], [3, 0, -3]], np.float64) / 32
    from scipy.ndimage import convolve

    return convolve(img, kx, mode="reflect")


def _scharr_h(img):
    ky = np.array([[3, 10, 3], [0, 0, 0], [-3, -10, -3]], np.float64) / 32
    from scipy.ndimage import convolve

    return convolve(img, ky, mode="reflect")


def get_bumpiness(gt, algo_result, mask, clip=0.05, factor=100):
    gt = np.asarray(gt, np.float64)
    algo_result = np.asarray(algo_result, np.float64)
    if gt.ndim == 4:
        gt = gt[0, 0]
    if algo_result.ndim == 4:
        algo_result = algo_result[0, 0]
    if np.asarray(mask).ndim == 4:
        mask = np.asarray(mask)[0, 0]
    diff = algo_result - gt
    dx, dy = _scharr_v(diff), _scharr_h(diff)
    bump = np.sqrt(
        np.square(_scharr_v(dx)) + np.square(_scharr_h(dx))
        + np.square(_scharr_h(dy)) + np.square(_scharr_v(dy))
    )
    bump = np.clip(bump, 0, clip)
    return np.mean(bump[mask]) * factor


def get_bumpiness_non_mask(gt, algo_result, clip=0.05, factor=100):
    ones = np.ones(np.asarray(gt).shape[-2:], bool)
    return get_bumpiness(gt, algo_result, ones, clip, factor)


# ================================
# Image quality (reference dff/metrics.py:134-158)
# ================================
def _to_uint8(img):
    img = np.asarray(img, np.float64)
    return np.clip(img * 255 + 0.5, 0, 255).astype(np.uint8)


def psnr(img_clean, img, data_range=255):
    img_clean = np.asarray(img_clean, np.float64)
    img = np.asarray(img, np.float64)
    err = np.mean((img_clean - img) ** 2)
    return 10 * np.log10(data_range**2 / err)


def ssim(img_clean, img, data_range=255, win_size=7, channel_axis=None,
         K1=0.01, K2=0.03):
    """Structural similarity, skimage-compatible defaults (uniform window)."""
    x = np.asarray(img_clean, np.float64)
    y = np.asarray(img, np.float64)
    if channel_axis is not None:
        x = np.moveaxis(x, channel_axis, 0)
        y = np.moveaxis(y, channel_axis, 0)
        return np.mean(
            [ssim(xc, yc, data_range, win_size) for xc, yc in zip(x, y)]
        )
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    filt = lambda a: uniform_filter(a, size=win_size)
    ux, uy = filt(x), filt(y)
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux**2 + uy**2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    pad = (win_size - 1) // 2
    return S[pad:-pad, pad:-pad].mean()


def batch_PSNR(img, img_clean):
    """uint8-quantised batch PSNR (reference dff/metrics.py:137-145)."""
    a = _to_uint8(img)
    b = _to_uint8(img_clean)
    vals = [psnr(b[i], a[i]) for i in range(a.shape[0])]
    return round(float(np.mean(vals)), 4)


def batch_SSIM(img, img_clean):
    """uint8-quantised batch SSIM over channels (reference dff/metrics.py:147-155)."""
    a = _to_uint8(img)
    b = _to_uint8(img_clean)
    vals = [ssim(b[i], a[i], channel_axis=0) for i in range(a.shape[0])]
    return round(float(np.mean(vals)), 4)


def mask_psnr(est_aif, gt_aif):
    return batch_PSNR(np.asarray(est_aif), np.asarray(gt_aif))


def mask_ssim(est_aif, gt_aif):
    return batch_SSIM(np.asarray(est_aif), np.asarray(gt_aif))
