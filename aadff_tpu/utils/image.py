"""Image IO helpers: RGB/16-bit depth PNG, colormap export, PFM reader.

PFM reading follows the format handled by the reference `pfmreader.py:1-64`
(Portable Float Map: 'PF'/'Pf' header, dims, negative scale = little endian),
re-implemented from the format specification.
"""
from __future__ import annotations

import re

import cv2 as cv
import numpy as np


def imread_rgb(path, resize=None):
    """Read an RGB image as float32 [H, W, 3] in [0, 1]."""
    img = cv.cvtColor(cv.imread(path), cv.COLOR_BGR2RGB).astype(np.float32) / 255.0
    if resize is not None:
        img = cv.resize(img, (resize[1], resize[0]))
    return img


def imread_depth_png(path, scale=1000.0, resize=None):
    """Read a 16-bit depth PNG, divide by `scale` (e.g. Middlebury /1000 -> m)."""
    depth = cv.imread(path, -1).astype(np.float32) / scale
    if resize is not None:
        depth = cv.resize(depth, (resize[1], resize[0]))
    return depth


def imwrite_colormap(path, depth, vmax=None):
    """Save a depth map as a JET colormap PNG (reference validate(),
    2_aber_aware_dff_aif.py:216-219)."""
    depth = np.asarray(depth, np.float64)
    vmax = depth.max() if vmax is None else vmax
    img = np.clip(depth / (vmax + 1e-12) * 255.0, 0, 255).astype(np.uint8)
    cv.imwrite(path, cv.applyColorMap(img, cv.COLORMAP_JET))


def read_pfm(path):
    """Read a PFM file -> (data [H, W] or [H, W, 3] float32, scale)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("Not a PFM file.")
        dim_line = f.readline()
        while dim_line.startswith(b"#"):
            dim_line = f.readline()
        m = re.match(rb"^(\d+)\s(\d+)\s*$", dim_line)
        if not m:
            raise ValueError("Malformed PFM header.")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    data = np.reshape(data, shape)
    return np.flipud(data).astype(np.float32), abs(scale)


def read_and_clean_pfm(path, clip_percentile=99.0):
    """PFM read + inf/outlier cleanup (reference pfmreader.py:66-88 intent)."""
    data, scale = read_pfm(path)
    finite = np.isfinite(data)
    if not finite.all():
        fill = np.percentile(data[finite], clip_percentile)
        data = np.where(finite, data, fill)
    return data, scale
