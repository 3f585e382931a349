"""Shipped configs load through the factory exactly as the training scripts
consume them."""
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shipped_aif_config_and_factory():
    from aadff_tpu.dff.factory import get_lens
    from aadff_tpu.psfnet import PSFNet
    from aadff_tpu.utils.config import load_config

    cfg = load_config(os.path.join(REPO, "configs/aber_aware_dff_aif.yml"))
    assert cfg["res"] == (480, 640)
    assert cfg["n_stack"] == 8 and cfg["ks"] == 11
    assert cfg["pred_name"] in ("depth", "aif", "depth_aif")
    assert float(cfg["lr"]) == 1e-4 and cfg["epochs"] == 20

    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        train_lens, test_lens = get_lens(cfg)
    finally:
        os.chdir(cwd)
    assert isinstance(train_lens, PSFNet)
    assert train_lens.kernel_size == 11
    assert abs(train_lens.lens.foclen - 49.818) < 0.01
    # converted weights are loaded (non-default output bias)
    b = np.asarray(train_lens.variables["params"]["Dense_10"]["bias"])
    assert np.abs(b).max() > 0


def test_dfv_config_parses():
    from aadff_tpu.utils.config import load_config

    cfg = load_config(os.path.join(REPO, "configs/aber_aware_dff_dfv.yml"))
    assert cfg["res"] == (480, 640)
    assert "DFV" in cfg["EXP_NAME"]
