"""Fit the implicit PSF representation (counterpart of `1_fit_psfnet.py`).

Input [x, y, z, foc_dist] -> [ks, ks] PSF kernel; labels are ray-traced on the
fly inside one jitted train step.
"""
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aadff_tpu.psfnet import PSFNet
from aadff_tpu.utils.logging import set_logger, set_seed

REPO = os.path.join(os.path.dirname(__file__), "..")
LENS = os.path.join(REPO, "lenses/rf50mm.json")
CKPT = os.path.join(REPO, "ckpt/rf50mm/psfnet_480x640_ks11.msgpack")

if __name__ == "__main__":
    result_dir = "./results/" + datetime.now().strftime("%m%d-%H%M%S") + "-psfnet"
    os.makedirs(result_dir, exist_ok=True)
    set_logger(result_dir)
    set_seed(0)

    psfnet = PSFNet(filename=LENS, sensor_res=(480, 640), kernel_size=11)
    from aadff_tpu.optics.analysis import analysis

    analysis(psfnet.lens, save_name=f"{result_dir}/lens")
    psfnet.lens.write_lens_json(f"{result_dir}/lens.json")

    if os.path.exists(CKPT):
        psfnet.load_net(CKPT)  # warm start from the reference checkpoint
    psfnet.train_psfnet(iters=100000, bs=128, lr=1e-4, spp=4096,
                        evaluate_every=1000, result_dir=result_dir)
    psfnet.evaluate_psf(result_dir=result_dir)
    l1, l2 = psfnet.evaluate_psf_score()
    print(f"avg l1 error: {l1}, avg l2 error: {l2}.")
    print("Finish PSF net fitting.")
