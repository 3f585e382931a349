"""Warm-up: load a real lens + pretrained PSFNet, analyse it, and render one
aberrated, defocused image (counterpart of the reference `0_warm_up.py`).

The reference repo ships Middlebury depth maps but its RGB images are stripped;
if `im0.png` is missing a synthetic RGB chart is used instead.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2 as cv
from aadff_tpu.psfnet import PSFNet
from aadff_tpu.utils.image import imread_depth_png

REPO = os.path.join(os.path.dirname(__file__), "..")
LENS = os.path.join(REPO, "lenses/rf50mm.json")
CKPT = os.path.join(REPO, "ckpt/rf50mm/psfnet_480x640_ks11.msgpack")
SCENE = "/root/reference/datasets/Middlebury2014/Adirondack-perfect"

if __name__ == "__main__":
    psfnet = PSFNet(filename=LENS, sensor_res=(480, 640), kernel_size=11)
    psfnet.load_net(CKPT)
    from aadff_tpu.optics.analysis import analysis

    analysis(psfnet.lens, save_name="./lens")

    if os.path.exists(f"{SCENE}/depth.png"):
        depth = imread_depth_png(f"{SCENE}/depth.png", scale=1000.0,
                                 resize=(480, 640))
    else:  # standalone fallback: a left-to-right depth ramp 0.5m .. 3m
        depth = np.linspace(0.5, 3.0, 640, dtype=np.float32)[None, :].repeat(480, 0)
    img_path = f"{SCENE}/im0.png"
    if os.path.exists(img_path):
        img = cv.cvtColor(cv.imread(img_path), cv.COLOR_BGR2RGB)
        img = cv.resize(img, (640, 480)).astype(np.float32) / 255.0
    else:
        yy, xx = np.mgrid[0:480, 0:640]
        img = np.stack(
            [((xx // 40 + yy // 40) % 2).astype(np.float32)] * 3, axis=-1
        ) * 0.8 + 0.1

    img_t = np.transpose(img, (2, 0, 1))[None]
    depth_t = -depth[None, None] * 1e3  # [mm]
    rendered = np.asarray(psfnet.render(img_t, depth_t, np.asarray([-2400.0])))

    out = np.clip(np.transpose(rendered[0], (1, 2, 0)) * 255, 0, 255).astype(np.uint8)
    cv.imwrite("./aberrated_defocused_img.png", cv.cvtColor(out, cv.COLOR_RGB2BGR))
    cv.imwrite(
        "./all_in_focus_img.png",
        cv.cvtColor((img * 255).astype(np.uint8), cv.COLOR_RGB2BGR),
    )
    print("wrote aberrated_defocused_img.png")
