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


def _native_lpips_weights_path():
    """Converted LPIPS-VGG weights, if the user provided them (see
    aadff_tpu/models/lpips.py: convert_lpips_vgg + save_lpips_msgpack)."""
    import os

    path = os.environ.get("AADFF_LPIPS_WEIGHTS")
    if path:
        return path if os.path.isfile(path) else None
    default = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "ckpt", "lpips_vgg.msgpack")
    return default if os.path.isfile(default) else None


def lpips_available(native_only: bool = False) -> bool:
    """True when `batch_LPIPS` has a working backend: converted native
    weights (ckpt/lpips_vgg.msgpack or $AADFF_LPIPS_WEIGHTS) or — unless
    ``native_only`` — a real `lpips` install.  Callers that must not risk a
    weights download at metric time (e.g. `train.trainer.validate`, which
    runs inside long training jobs) pass ``native_only=True``: an importable
    `lpips` package still fetches its pretrained weights on first
    construction, which offline turns "emit the metric when possible" into
    an exception mid-validate."""
    if _native_lpips_weights_path() is not None:
        return True
    if native_only:
        return False
    try:
        import lpips  # noqa: F401
    except ImportError:
        return False
    return getattr(lpips, "__file__", None) is not None


def _load_native_lpips(path):
    """Load-once cache: validate loops call batch_LPIPS per image.

    Returns (variables, jitted_apply).  The apply is jitted once and cached
    with the weights: validate() runs LPIPS per validation image inside long
    training jobs, and an unjitted VGG forward dispatches every conv op
    separately — over this repo's ~25 ms/dispatch tunnelled TPU link that is
    multiple seconds per image (round-4 advisor finding).  Shapes are fixed
    per run, so one compile amortizes across the whole loop."""
    global _NATIVE_LPIPS_CACHE
    try:
        cached_path, variables, apply = _NATIVE_LPIPS_CACHE
        if cached_path == path:
            return variables, apply
    except NameError:
        pass
    import jax

    from ..models.lpips import LPIPSVgg, load_lpips_msgpack

    variables = load_lpips_msgpack(path)
    apply = jax.jit(LPIPSVgg().apply)
    _NATIVE_LPIPS_CACHE = (path, variables, apply)
    return variables, apply


def batch_LPIPS(img, img_clean):
    """Perceptual similarity (reference deeplens/utils.py:38-45 uses
    lpips.LPIPS(net='vgg', spatial=True) and returns dist.mean()).

    Preferred backend: the native Flax LPIPS-VGG
    (aadff_tpu/models/lpips.py) with converted weights from
    ``ckpt/lpips_vgg.msgpack`` or ``$AADFF_LPIPS_WEIGHTS``.  Falls back to a
    real `lpips` install; gated with a clear error when neither exists
    (pretrained perceptual weights cannot be downloaded here).

    Inputs [B, 3, H, W] in [0, 1]; scaled to the [-1, 1] range LPIPS
    expects (the reference passes [0, 1] straight through — a known quirk
    of its script, not of the metric).
    """
    native = _native_lpips_weights_path()
    if native is not None:
        import jax.numpy as jnp

        variables, apply = _load_native_lpips(native)
        a = jnp.transpose(jnp.asarray(np.asarray(img)), (0, 2, 3, 1)) * 2 - 1
        b = jnp.transpose(
            jnp.asarray(np.asarray(img_clean)), (0, 2, 3, 1)) * 2 - 1
        return float(jnp.mean(apply(variables, a, b)))
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

    # Match the reference metric (deeplens/utils.py:38-45: net='vgg',
    # spatial=True) and build the net once — validate loops call this per
    # image, and constructing lpips.LPIPS reloads pretrained weights.
    global _TORCH_LPIPS_CACHE
    try:
        loss_fn = _TORCH_LPIPS_CACHE
    except NameError:
        loss_fn = _TORCH_LPIPS_CACHE = lpips.LPIPS(net="vgg", spatial=True)
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
