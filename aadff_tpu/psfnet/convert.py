"""Convert reference PyTorch PSFNet checkpoints to Flax params.

The reference ships `ckpt/rf50mm/PSFNet480x640_ks11.pkl`, a torch `state_dict`
of the MLP in `deeplens/psfnet_arch.py:24-47` (keys `net.{0,2,...,20}.weight/
bias`).  Layer order maps 1:1 onto our Flax `MLP` (`Dense_0..Dense_10`);
torch stores Linear weights as [out, in] so kernels are transposed.
"""
from __future__ import annotations

import numpy as np


def torch_mlp_to_flax(state_dict) -> dict:
    """torch state_dict (or path to a torch .pkl) -> flax params for `MLP`."""
    if isinstance(state_dict, (str, bytes)):
        import torch

        state_dict = torch.load(state_dict, map_location="cpu")

    # order linear layers by their index in nn.Sequential
    idxs = sorted(
        {int(k.split(".")[1]) for k in state_dict.keys() if k.endswith(".weight")}
    )
    params = {}
    for dense_i, torch_i in enumerate(idxs):
        w = np.asarray(state_dict[f"net.{torch_i}.weight"].detach().cpu().numpy())
        b = np.asarray(state_dict[f"net.{torch_i}.bias"].detach().cpu().numpy())
        params[f"Dense_{dense_i}"] = {
            "kernel": w.T.astype(np.float32),
            "bias": b.astype(np.float32),
        }
    return {"params": params}


def flax_mlp_to_torch_state(params: dict) -> dict:
    """Inverse conversion (for exporting back to the reference format)."""
    import torch

    out = {}
    dense = params["params"]
    for i in range(len(dense)):
        w = np.asarray(dense[f"Dense_{i}"]["kernel"]).T
        b = np.asarray(dense[f"Dense_{i}"]["bias"])
        out[f"net.{2 * i}.weight"] = torch.tensor(w)
        out[f"net.{2 * i}.bias"] = torch.tensor(b)
    return out
