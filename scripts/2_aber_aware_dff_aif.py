"""Aberration-aware DFF training with AiFDepthNet
(counterpart of `2_aber_aware_dff_aif.py`)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aadff_tpu.train.dff_aif import main

if __name__ == "__main__":
    main()
