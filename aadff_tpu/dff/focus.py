"""Focus-distance selection for focal-stack synthesis.

Port of `dff/utils.py:4-51` with the same two modes ('linear' and
'importance'); pure numpy on host (runs once per batch, tiny).
"""
from __future__ import annotations

import numpy as np


def select_focus_dist(depth, num, mode="linear", rng=None):
    """depth: [B, 1, H, W] (>0 valid); returns sorted [B, num] focus distances."""
    assert num > 3, "Focal stack size is too small"
    depth = np.asarray(depth)
    B = depth.shape[0]
    mask = depth > 0

    avg_depth = depth.sum(axis=(1, 2, 3)) / mask.sum(axis=(1, 2, 3))
    depth_max = depth.max(axis=(1, 2, 3))
    depth_min = np.zeros_like(depth_max)
    for i in range(B):
        depth_min[i] = depth[i][mask[i]].min()

    if mode == "linear":
        focus_dists = [
            depth_min + i * (depth_max - depth_min) / (num - 1) for i in range(num)
        ]
    elif mode == "importance":
        rng = np.random.default_rng() if rng is None else rng
        focus_dists = [depth_max, depth_min]
        target = num - 2
        while len(focus_dists) < target:
            fd = rng.random() * (depth_max - depth_min) + depth_min
            accept_rate = np.where(
                fd > avg_depth,
                (depth_max - fd) / (depth_max - avg_depth),
                (fd - depth_min) / (avg_depth - depth_min),
            )
            if rng.random() < accept_rate.mean():
                focus_dists.append(fd)
    else:
        raise NotImplementedError(mode)

    focus_dists = np.stack(focus_dists, axis=1)
    return np.sort(focus_dists, axis=-1)
