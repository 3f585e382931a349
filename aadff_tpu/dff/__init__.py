from .dataset import (
    AutoAgument,
    Dataset,
    FlyingThings3D,
    Matterport3D,
    Middlebury,
    NumpyLoader,
    RealWorld,
    auto_augment,
)
from .focus import select_focus_dist
from . import metrics
from .metrics import (
    batch_PSNR,
    batch_SSIM,
    mask_abs_rel,
    mask_accuracy_k,
    mask_mae,
    mask_mse,
    mask_psnr,
    mask_rmse,
    mask_rmse_log,
    mask_sq_rel,
    mask_ssim,
)

__all__ = [
    "AutoAgument", "Dataset", "FlyingThings3D", "Matterport3D", "Middlebury",
    "NumpyLoader", "RealWorld", "auto_augment", "select_focus_dist", "metrics",
    "batch_PSNR", "batch_SSIM", "mask_abs_rel", "mask_accuracy_k", "mask_mae",
    "mask_mse", "mask_psnr", "mask_rmse", "mask_rmse_log", "mask_sq_rel",
    "mask_ssim",
]
