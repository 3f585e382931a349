"""Warm-up variant reading Middlebury PFM disparity and converting to depth
via Z = f*b/(d + doffs) (counterpart of `0_warm_up_with_pfm.py:26-29`)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2 as cv
from aadff_tpu.psfnet import PSFNet
from aadff_tpu.utils.image import read_pfm

REPO = os.path.join(os.path.dirname(__file__), "..")
LENS = os.path.join(REPO, "lenses/rf50mm.json")
CKPT = os.path.join(REPO, "ckpt/rf50mm/psfnet_480x640_ks11.msgpack")


def disparity_to_depth(disp, focal=4161.221, baseline=176.252, doffs=209.059):
    """Middlebury calib: Z [mm] = f*b/(d + doffs)."""
    return focal * baseline / (disp + doffs)


if __name__ == "__main__":
    scene = sys.argv[1] if len(sys.argv) > 1 else None
    if scene is None or not os.path.exists(f"{scene}/disp0.pfm"):
        print("usage: 0_warm_up_with_pfm.py <scene_dir with disp0.pfm and im0.png>")
        sys.exit(0)

    disp, _ = read_pfm(f"{scene}/disp0.pfm")
    depth = disparity_to_depth(disp)  # [mm]
    depth = cv.resize(depth, (640, 480))

    img = cv.cvtColor(cv.imread(f"{scene}/im0.png"), cv.COLOR_BGR2RGB)
    img = cv.resize(img, (640, 480)).astype(np.float32) / 255.0

    psfnet = PSFNet(filename=LENS, sensor_res=(480, 640), kernel_size=11)
    psfnet.load_net(CKPT)
    rendered = np.asarray(
        psfnet.render(
            np.transpose(img, (2, 0, 1))[None], -depth[None, None],
            np.asarray([-2400.0]),
        )
    )
    out = np.clip(np.transpose(rendered[0], (1, 2, 0)) * 255, 0, 255).astype(np.uint8)
    cv.imwrite("./aberrated_defocused_img_pfm.png", cv.cvtColor(out, cv.COLOR_RGB2BGR))
    print("wrote aberrated_defocused_img_pfm.png")
