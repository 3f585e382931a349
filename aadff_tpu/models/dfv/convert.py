"""Convert torchvision ResNet18 weights into our Flax FeatExactor backbone.

The reference uses `torchvision.models.resnet18(pretrained=True)` as the DFV
feature extractor (`DFV_models/featExactor2.py:87`).  torchvision is not
available in this environment, so the converter takes a torch `state_dict`
file (saved from torchvision elsewhere) and maps the backbone weights onto the
matching Flax params; FPN/pyramid heads keep their fresh initialisation (they
are trained from scratch in the reference too).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(w):
    # torch conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]
    return np.transpose(np.asarray(w), (2, 3, 1, 0)).astype(np.float32)


def _bn(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }, {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }


def load_torchvision_resnet18(state_dict_path: str) -> Dict:
    """Returns {'params': {...}, 'batch_stats': {...}} fragments keyed by the
    module names FeatExactor generates for its backbone, to be merged into a
    freshly-initialised variables tree with `merge_resnet18_into`."""
    import torch

    sd = torch.load(state_dict_path, map_location="cpu")
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    params, stats = {}, {}

    # stem: TorchConv_0 / BatchNorm_0
    params["TorchConv_0"] = {"Conv_0": {"kernel": _conv(sd["conv1.weight"])}}
    s, st = _bn(sd, "bn1")
    params["BatchNorm_0"] = s
    stats["BatchNorm_0"] = st

    # layers 1..4, two BasicBlocks each -> BasicBlock_0..BasicBlock_7
    bi = 0
    for layer in range(1, 5):
        for block in range(2):
            prefix = f"layer{layer}.{block}"
            bp, bs = {}, {}
            bp["TorchConv_0"] = {
                "Conv_0": {"kernel": _conv(sd[f"{prefix}.conv1.weight"])}
            }
            s, st = _bn(sd, f"{prefix}.bn1")
            bp["BatchNorm_0"], bs["BatchNorm_0"] = s, st
            bp["TorchConv_1"] = {
                "Conv_0": {"kernel": _conv(sd[f"{prefix}.conv2.weight"])}
            }
            s, st = _bn(sd, f"{prefix}.bn2")
            bp["BatchNorm_1"], bs["BatchNorm_1"] = s, st
            if f"{prefix}.downsample.0.weight" in sd:
                bp["TorchConv_2"] = {
                    "Conv_0": {"kernel": _conv(sd[f"{prefix}.downsample.0.weight"])}
                }
                s, st = _bn(sd, f"{prefix}.downsample.1")
                bp["BatchNorm_2"], bs["BatchNorm_2"] = s, st
            params[f"BasicBlock_{bi}"] = bp
            stats[f"BasicBlock_{bi}"] = bs
            bi += 1

    return {"params": params, "batch_stats": stats}


def merge_resnet18_into(variables: Dict, backbone: Dict,
                        feat_path=("feature_extraction",)) -> Dict:
    """Merge converted backbone weights into a DFVNet/FeatExactor variables
    tree (out-of-place)."""
    import copy

    out = copy.deepcopy(jax_to_py(variables))
    for col in ("params", "batch_stats"):
        node = out[col]
        for p in feat_path:
            node = node[p]
        for k, v in backbone[col].items():
            _merge_nested(node[k], v)
    return out


def _merge_nested(dst, src):
    for k, v in src.items():
        if isinstance(v, dict):
            _merge_nested(dst[k], v)
        else:
            assert dst[k].shape == v.shape, (k, dst[k].shape, v.shape)
            dst[k] = v


def jax_to_py(tree):
    import jax

    return jax.tree.map(np.asarray, jax.device_get(tree))
