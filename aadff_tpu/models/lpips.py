"""Native LPIPS (VGG16 variant) perceptual metric in Flax.

The reference computes LPIPS with the `lpips` package:
``lpips.LPIPS(net='vgg', spatial=True)`` then ``dist.mean()``
(/root/reference/deeplens/utils.py:38-45).  That package is not installed
here and its pretrained weights cannot be downloaded, so this module
implements the same network natively (NHWC, jittable) plus a torch→Flax
weight converter, mirroring the DFVNet ResNet18 approach
(aadff_tpu/models/dfv/convert.py): the *architecture and converter* are
tested numerically against a torch functional forward on random
real-layout state dicts; real weights drop in via the converter whenever a
torchvision `vgg16` state_dict and the lpips `lin` heads are available.

LPIPS(net='vgg') semantics (the published perceptual-metric recipe):
  1. ScalingLayer: ``(x - shift) / scale`` per channel on [-1, 1] inputs.
  2. VGG16 `.features` conv stack; taps after relu1_2, relu2_2, relu3_3,
     relu4_3, relu5_3 (torchvision feature indices 3, 8, 15, 22, 29).
  3. Each tap unit-normalized over channels: ``x / (||x||_2 + 1e-10)``.
  4. Squared difference of normalized taps.
  5. Per-tap 1x1 no-bias conv ("lin" head) to 1 channel.
  6. spatial=True: bilinear-upsample each head map to the input H, W
     (align_corners=False) and sum over taps -> [B, H, W, 1]; the scalar
     score is the mean (reference utils.py:45).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (channels, n_convs) per VGG16 slice; a 2x2/2 max-pool precedes every slice
# but the first.  Taps are the last relu of each slice.
VGG_SLICES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
# torchvision vgg16().features indices of the 13 convs, in order.
TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class _VGGTaps(nn.Module):
    """VGG16 conv stack returning the five LPIPS tap activations (NHWC)."""

    @nn.compact
    def __call__(self, x):
        taps = []
        for si, (ch, n_convs) in enumerate(VGG_SLICES):
            if si:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for _ in range(n_convs):
                x = nn.relu(nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)])(x))
            taps.append(x)
        return taps


class LPIPSVgg(nn.Module):
    """LPIPS-VGG16.  Inputs NHWC; returns [B, H, W, 1] map (spatial=True)
    or [B] scores (spatial=False)."""

    spatial: bool = True

    @nn.compact
    def __call__(self, in0, in1):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = _VGGTaps(name="vgg")
        taps0 = vgg((in0 - shift) / scale)
        taps1 = vgg((in1 - shift) / scale)

        h, w = in0.shape[1], in0.shape[2]
        total = None
        per_tap = []
        for k, (t0, t1) in enumerate(zip(taps0, taps1)):
            n0 = t0 / (jnp.linalg.norm(t0, axis=-1, keepdims=True) + 1e-10)
            n1 = t1 / (jnp.linalg.norm(t1, axis=-1, keepdims=True) + 1e-10)
            d = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{k}")(
                (n0 - n1) ** 2)
            if self.spatial:
                d = jax.image.resize(d, (d.shape[0], h, w, 1), "bilinear")
            else:
                d = jnp.mean(d, axis=(1, 2))
            per_tap.append(d)
            total = d if total is None else total + d
        return total if self.spatial else total[..., 0]


def convert_lpips_vgg(vgg_features_sd: Dict, lin_sd: Dict) -> Dict:
    """torch state dicts -> LPIPSVgg params pytree.

    `vgg_features_sd`: torchvision ``vgg16().features`` layout
    (``features.{i}.weight/bias`` or bare ``{i}.weight/bias``).
    `lin_sd`: lpips package heads (``lin{k}.model.1.weight``, [1, C, 1, 1]).
    """
    def _get(sd, key):
        t = sd.get(f"features.{key}", sd.get(key))
        if t is None:
            raise KeyError(f"missing '{key}' (or 'features.{key}')")
        return np.asarray(t, np.float32)

    vgg = {}
    for ci, ti in enumerate(TORCH_CONV_IDX):
        vgg[f"Conv_{ci}"] = {
            # torch [O, I, kh, kw] -> flax [kh, kw, I, O]
            "kernel": _get(vgg_features_sd, f"{ti}.weight")
            .transpose(2, 3, 1, 0),
            "bias": _get(vgg_features_sd, f"{ti}.bias"),
        }
    params = {"vgg": vgg}
    for k in range(len(VGG_SLICES)):
        w = np.asarray(lin_sd[f"lin{k}.model.1.weight"], np.float32)
        params[f"lin{k}"] = {"kernel": w.transpose(2, 3, 1, 0)}
    return {"params": params}


def save_lpips_msgpack(variables: Dict, path: str) -> None:
    import os

    from flax import serialization

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(variables))
    os.replace(tmp, path)


def load_lpips_msgpack(path: str) -> Dict:
    from flax import serialization

    model = LPIPSVgg()
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))
    with open(path, "rb") as f:
        return serialization.from_bytes(
            jax.tree_util.tree_map(np.asarray, template), f.read())
