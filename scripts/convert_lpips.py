"""Convert real LPIPS-VGG weights to the native Flax backend.

Usage:
    python scripts/convert_lpips.py <vgg16.pth> <lpips_lins.pth> \
        [out.msgpack = ckpt/lpips_vgg.msgpack]

`vgg16.pth`: torchvision ``vgg16(pretrained=True).state_dict()`` (full model
or just ``.features``).  `lpips_lins.pth`: the lpips package's pretrained
linear heads (``lpips/weights/v0.1/vgg.pth`` — keys ``lin{k}.model.1.weight``).
Neither file can be downloaded in this environment; this script is the
drop-in path for users who have them (reference deeplens/utils.py:38-45 uses
lpips.LPIPS(net='vgg')).  The conversion itself is numerically tested on
random real-layout state dicts in tests/test_lpips.py.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from aadff_tpu.models.lpips import convert_lpips_vgg, save_lpips_msgpack  # noqa: E402


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    import torch

    vgg_sd = torch.load(sys.argv[1], map_location="cpu")
    if hasattr(vgg_sd, "state_dict"):
        vgg_sd = vgg_sd.state_dict()
    lin_sd = torch.load(sys.argv[2], map_location="cpu")
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "ckpt", "lpips_vgg.msgpack")
    variables = convert_lpips_vgg(
        {k: v for k, v in vgg_sd.items()}, {k: v for k, v in lin_sd.items()})
    save_lpips_msgpack(variables, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
