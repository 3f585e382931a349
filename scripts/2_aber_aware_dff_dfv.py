"""Aberration-aware DFF training with DFVNet
(counterpart of `2_aber_aware_dff_dfv.py`, with its latent bugs fixed)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aadff_tpu.train.dff_dfv import main

if __name__ == "__main__":
    main()
