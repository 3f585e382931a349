"""Image-quality / tensor utilities (reference deeplens/utils.py:15-130).

LPIPS depends on a pretrained perceptual network that is not available in
this environment; `batch_LPIPS` is gated and raises with a clear message
unless an lpips backend is importable.
"""
from __future__ import annotations

import numpy as np

from ..dff.metrics import batch_PSNR, batch_SSIM  # canonical implementations

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_imagenet(img):
    """[..., 3, H, W] in [0,1] -> ImageNet-normalised
    (reference deeplens/utils.py:52-81)."""
    import jax.numpy as jnp

    img = jnp.asarray(img)
    mean = jnp.asarray(IMAGENET_MEAN)[:, None, None]
    std = jnp.asarray(IMAGENET_STD)[:, None, None]
    return (img - mean) / std


def denormalize_imagenet(img):
    import jax.numpy as jnp

    img = jnp.asarray(img)
    mean = jnp.asarray(IMAGENET_MEAN)[:, None, None]
    std = jnp.asarray(IMAGENET_STD)[:, None, None]
    return img * std + mean


def batch_LPIPS(img, img_clean):
    """Perceptual similarity; requires an `lpips` install (gated)."""
    try:
        import lpips  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "LPIPS requires the `lpips` package (pretrained AlexNet/VGG "
            "weights), which is not available in this environment."
        ) from e
    # A bare ModuleType stub (installed e.g. by tests that import the torch
    # reference with its heavy deps faked) has no __file__; treat it the same
    # as an absent package so the gate is independent of import order.
    if getattr(lpips, "__file__", None) is None:
        raise RuntimeError(
            "LPIPS requires the `lpips` package (pretrained AlexNet/VGG "
            "weights); only a stub module is installed in this environment."
        )
    import torch

    loss_fn = lpips.LPIPS(net="alex")
    a = torch.tensor(np.asarray(img)) * 2 - 1
    b = torch.tensor(np.asarray(img_clean)) * 2 - 1
    with torch.no_grad():
        return float(loss_fn(a, b).mean())


def print_memory():
    """Device memory stats (reference deeplens/utils.py:125-130 prints CUDA
    memory; here: per-device live bytes from the JAX runtime when available)."""
    import jax

    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
            used = stats.get("bytes_in_use", 0) / 2**20
            limit = stats.get("bytes_limit", 0) / 2**20
            print(f"{d}: {used:.1f} MiB in use / {limit:.1f} MiB")
        except Exception:
            print(f"{d}: memory stats unavailable")
