"""ResNet18 weight converter: synthesize a torchvision-layout state_dict and
check it merges cleanly into FeatExactor variables."""
import numpy as np
import pytest


def _fake_resnet18_state_dict():
    import torch

    sd = {}

    def conv(name, out_c, in_c, k):
        sd[name] = torch.zeros(out_c, in_c, k, k)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.ones(c)
        sd[f"{prefix}.bias"] = torch.zeros(c)
        sd[f"{prefix}.running_mean"] = torch.zeros(c)
        sd[f"{prefix}.running_var"] = torch.ones(c)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    chans = {1: (64, 64), 2: (128, 64), 3: (256, 128), 4: (512, 256)}
    for layer, (c, c_in) in chans.items():
        for block in range(2):
            p = f"layer{layer}.{block}"
            first_in = c_in if block == 0 else c
            conv(f"{p}.conv1.weight", c, first_in, 3)
            bn(f"{p}.bn1", c)
            conv(f"{p}.conv2.weight", c, c, 3)
            bn(f"{p}.bn2", c)
            if block == 0 and layer > 1:
                conv(f"{p}.downsample.0.weight", c, c_in, 1)
                bn(f"{p}.downsample.1", c)
    return sd


def test_resnet18_converter_merges(tmp_path):
    import jax
    import jax.numpy as jnp
    import torch

    from aadff_tpu.models.dfv.convert import (
        load_torchvision_resnet18,
        merge_resnet18_into,
    )
    from aadff_tpu.models.dfv.feat import FeatExactor

    sd = _fake_resnet18_state_dict()
    path = tmp_path / "resnet18.pth"
    torch.save(sd, str(path))

    model = FeatExactor()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=True)
    backbone = load_torchvision_resnet18(str(path))
    merged = merge_resnet18_into(variables, backbone, feat_path=())

    # stem kernel now zero (from the fake dict), FPN head untouched
    stem = merged["params"]["TorchConv_0"]["Conv_0"]["kernel"]
    assert stem.shape == (7, 7, 3, 64)
    assert np.all(stem == 0)
    out = model.apply(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        jnp.ones((1, 64, 64, 3)), train=False,
    )
    assert out[0].shape[-1] == 128
