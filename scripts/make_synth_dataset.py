"""Build the SynthMiddlebury RGB-D training/eval set.

The reference trains on Matterport3D RGB-D and evaluates on Middlebury2014
(2_aber_aware_dff_aif.py + configs/aber_aware_dff_aif.yml); neither the
Matterport RGB-D data nor the Middlebury `im0.png` RGB files exist in this
environment (.MISSING_LARGE_BLOBS).  What does exist are the 23 real
Middlebury2014 depth maps (`datasets/Middlebury2014/*/depth.png`, uint16 mm).

This script synthesises procedural RGB textures over those real depth maps
(texture discontinuities aligned with depth segments — the defocus cue DFF
training needs) plus fully procedural RGB-D scenes, and writes a
Middlebury-layout dataset:

    datasets/SynthMiddlebury/{train,val}/<scene>/{im0.png, depth.png}

depth.png is uint16 millimetres (loader divides by 1000 -> m), exactly the
Middlebury loader contract (reference dff/dataset.py:173-205).

Deterministic: seeded numpy Generator throughout.
"""
from __future__ import annotations

import os
import sys
from glob import glob

import cv2 as cv
import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
REF_DEPTH_DIR = "/root/reference/datasets/Middlebury2014"
OUT = os.path.join(REPO, "datasets", "SynthMiddlebury")
H, W = 480, 640
VAL_SCENES = ["Adirondack-perfect", "Piano-perfect", "Playroom-perfect",
              "Recycle-perfect", "Vintage-perfect"]
TRAIN_VARIANTS = 4   # textures per training depth map
N_PROCEDURAL = 40    # fully synthetic RGB-D training scenes
N_PROCEDURAL_VAL = 7  # held-out procedural val scenes (separate RNG stream)
# r3 scale-up (VERDICT r2 #8): 12 val scenes instead of 5 so epoch-to-epoch
# validation noise (+-0.03 AbsRel on 5 scenes) stops deciding the
# aberration-aware vs thin-lens comparison; train grows 78 -> 112 scenes.
N_PROCEDURAL_TEST = 16  # never-seen test split (third RNG stream): 16
# procedural scenes whose depth geometry appears in no other split, used
# only for the one-shot post-training evaluation (no checkpoint selection
# happens on it, unlike val's best-MSE gating).  The 5 val real depth maps
# with fresh textures go to test_retex/ instead: their *geometry* gated
# best-checkpoint selection, so they probe texture generalization only and
# must not be averaged into the held-out test numbers.


def _smooth_field(rng, h, w, n_waves=6, freq_lo=0.5, freq_hi=4.0):
    """Sum of random low-frequency sinusoids in [0, 1]."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy, xx = yy / h, xx / w
    f = np.zeros((h, w), np.float32)
    for _ in range(n_waves):
        fx, fy = rng.uniform(freq_lo, freq_hi, 2)
        ph = rng.uniform(0, 2 * np.pi)
        f += rng.uniform(0.3, 1.0) * np.sin(
            2 * np.pi * (fx * xx + fy * yy) + ph
        )
    f -= f.min()
    return f / max(f.max(), 1e-6)


def _pattern(rng, h, w):
    """One high-frequency texture patch: stripes / checker / noise / dots."""
    kind = rng.integers(0, 4)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    if kind == 0:  # oriented stripes
        th = rng.uniform(0, np.pi)
        freq = rng.uniform(0.05, 0.45)
        u = np.cos(th) * xx + np.sin(th) * yy
        return 0.5 + 0.5 * np.sign(np.sin(2 * np.pi * freq * u))
    if kind == 1:  # checkerboard
        s = rng.integers(6, 28)
        return (((yy // s) + (xx // s)) % 2).astype(np.float32)
    if kind == 2:  # band-passed noise
        n = rng.standard_normal((h, w)).astype(np.float32)
        k = int(rng.integers(1, 4)) * 2 + 1
        n = cv.GaussianBlur(n, (k, k), 0)
        n -= n.min()
        return n / max(n.max(), 1e-6)
    # dots
    img = np.zeros((h, w), np.float32)
    for _ in range(int(rng.integers(40, 160))):
        c = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        cv.circle(img, c, int(rng.integers(2, 9)), 1.0, -1)
    return img


def synth_texture(rng, depth_m):
    """RGB [H, W, 3] in [0,1] whose texture segments follow depth structure."""
    h, w = depth_m.shape
    base = np.stack([_smooth_field(rng, h, w) for _ in range(3)], -1)
    base = 0.25 + 0.5 * base

    valid = depth_m > 0
    d = depth_m.copy()
    if valid.any():
        lo, hi = np.quantile(d[valid], [0.02, 0.98])
    else:
        lo, hi = 0.0, 1.0
    n_seg = int(rng.integers(3, 6))
    edges = np.linspace(lo, hi, n_seg + 1)
    out = base.copy()
    for s in range(n_seg):
        seg = valid & (d >= edges[s]) & (d <= edges[s + 1] + 1e-6)
        if not seg.any():
            continue
        pat = _pattern(rng, h, w)[..., None]
        color_a = rng.uniform(0.05, 0.95, 3).astype(np.float32)
        color_b = rng.uniform(0.05, 0.95, 3).astype(np.float32)
        tex = color_a * pat + color_b * (1 - pat)
        alpha = rng.uniform(0.55, 0.9)
        out = np.where(seg[..., None], (1 - alpha) * out + alpha * tex, out)

    # a few depth-agnostic paint strokes for texture inside segments
    for _ in range(int(rng.integers(3, 8))):
        mask = np.zeros((h, w), np.float32)
        p0 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        p1 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        cv.line(mask, p0, p1, 1.0, int(rng.integers(2, 10)))
        col = rng.uniform(0, 1, 3).astype(np.float32)
        out = np.where(mask[..., None] > 0, 0.35 * out + 0.65 * col, out)
    return np.clip(out, 0.0, 1.0)


def procedural_depth(rng):
    """Synthetic depth [H, W] in metres: far plane/slant + nearer shapes."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    yy, xx = yy / H, xx / W
    far = rng.uniform(3.0, 8.0)
    gx, gy = rng.uniform(-2.0, 2.0, 2)
    d = far + gx * (xx - 0.5) + gy * (yy - 0.5)  # slanted background
    for _ in range(int(rng.integers(3, 9))):
        z = rng.uniform(0.4, 0.8 * far)
        mask = np.zeros((H, W), np.float32)
        if rng.random() < 0.5:
            c = (int(rng.integers(0, W)), int(rng.integers(0, H)))
            cv.circle(mask, c, int(rng.integers(30, 140)), 1.0, -1)
        else:
            x0, y0 = rng.integers(0, W - 40), rng.integers(0, H - 40)
            x1 = int(min(W, x0 + rng.integers(40, 300)))
            y1 = int(min(H, y0 + rng.integers(40, 300)))
            mask[y0:y1, x0:x1] = 1.0
        # objects occlude: take the nearer depth
        d = np.where(mask > 0, np.minimum(d, z), d)
    return np.clip(d, 0.3, 20.0)


def write_scene(scene_dir, rgb, depth_m):
    os.makedirs(scene_dir, exist_ok=True)
    cv.imwrite(os.path.join(scene_dir, "im0.png"),
               cv.cvtColor((rgb * 255).astype(np.uint8), cv.COLOR_RGB2BGR))
    cv.imwrite(os.path.join(scene_dir, "depth.png"),
               np.clip(depth_m * 1000, 0, 65535).astype(np.uint16))


def main(out_dir=OUT):
    rng = np.random.default_rng(2014)
    scenes = sorted(glob(f"{REF_DEPTH_DIR}/*/depth.png"))
    assert scenes, f"no reference depth maps under {REF_DEPTH_DIR}"
    n_train = n_val = 0
    for path in scenes:
        scene = path.split("/")[-2]
        depth_mm = cv.imread(path, -1).astype(np.float32)
        depth_m = cv.resize(depth_mm, (W, H),
                            interpolation=cv.INTER_NEAREST) / 1000.0
        if scene in VAL_SCENES:
            write_scene(os.path.join(out_dir, "val", scene),
                        synth_texture(rng, depth_m), depth_m)
            n_val += 1
        else:
            for k in range(TRAIN_VARIANTS):
                write_scene(os.path.join(out_dir, "train", f"{scene}-t{k}"),
                            synth_texture(rng, depth_m), depth_m)
                n_train += 1
    for k in range(N_PROCEDURAL):
        depth_m = procedural_depth(rng)
        write_scene(os.path.join(out_dir, "train", f"Procedural-{k:02d}"),
                    synth_texture(rng, depth_m), depth_m)
        n_train += 1
    # held-out procedural val scenes: separate RNG stream, no train leakage
    rng_val = np.random.default_rng(998877)
    for k in range(N_PROCEDURAL_VAL):
        depth_m = procedural_depth(rng_val)
        write_scene(os.path.join(out_dir, "val", f"ProceduralVal-{k:02d}"),
                    synth_texture(rng_val, depth_m), depth_m)
        n_val += 1
    # test split: third RNG stream; strictly held-out — fresh procedural
    # geometry only.  Evaluated once per trained checkpoint; no model/epoch
    # selection uses it.
    rng_test = np.random.default_rng(555333)
    n_test = n_retex = 0
    for path in scenes:
        scene = path.split("/")[-2]
        if scene not in VAL_SCENES:
            continue
        depth_mm = cv.imread(path, -1).astype(np.float32)
        depth_m = cv.resize(depth_mm, (W, H),
                            interpolation=cv.INTER_NEAREST) / 1000.0
        # val geometry + fresh textures: texture-generalization probe only
        # (best-checkpoint selection gated on these depth maps via val MSE,
        # so they would bias a "never-seen" test average)
        write_scene(os.path.join(out_dir, "test_retex", f"{scene}-retex"),
                    synth_texture(rng_test, depth_m), depth_m)
        n_retex += 1
    for k in range(N_PROCEDURAL_TEST):
        depth_m = procedural_depth(rng_test)
        write_scene(os.path.join(out_dir, "test", f"ProceduralTest-{k:02d}"),
                    synth_texture(rng_test, depth_m), depth_m)
        n_test += 1
    print(f"SynthMiddlebury: {n_train} train, {n_val} val, {n_test} test, "
          f"{n_retex} test_retex scenes -> {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
