"""Dataset loaders on synthetic files: Matterport3D, FlyingThings3D (AiF and
focal-stack modes), RealWorld; plus utils/quality and profiling helpers."""
import os

import numpy as np
import pytest


def test_matterport3d_loader(tmp_path):
    import cv2 as cv

    from aadff_tpu.dff.dataset import Matterport3D

    rgb = tmp_path / "rgb" / "scene1" / "undistorted_color_images"
    dep = tmp_path / "dep" / "scene1" / "render_depth"
    rgb.mkdir(parents=True)
    dep.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        cv.imwrite(str(rgb / f"img{i}.jpg"),
                   rng.uniform(0, 255, (40, 48, 3)).astype(np.uint8))
        cv.imwrite(str(dep / f"img{i}.png"),
                   rng.uniform(1000, 12000, (40, 48)).astype(np.uint16))

    ds = Matterport3D(str(tmp_path / "rgb"), str(tmp_path / "dep"),
                      resize=(32, 32), train=True)
    assert len(ds) == 2
    aif, depth = ds[0]
    assert aif.shape == (3, 32, 32) and depth.shape == (1, 32, 32)
    assert depth.max() < 4  # png/4000 -> metres


def test_flyingthings3d_aif_and_stack_modes(tmp_path):
    import cv2 as cv

    from aadff_tpu.dff.dataset import FlyingThings3D

    scene = tmp_path / "sceneA"
    scene.mkdir()
    rng = np.random.default_rng(1)
    disp = rng.uniform(10, 40, (32, 40)).astype(np.float32)
    # this environment's OpenCV lacks the EXR codec; the loader's documented
    # .npy fallback covers the same path
    np.save(str(scene / "disp.npy"), disp)
    cv.imwrite(str(scene / "AiF.png"),
               rng.uniform(0, 255, (32, 40, 3)).astype(np.uint8))
    for fd in ["10.0", "20.0", "30.0"]:
        cv.imwrite(str(scene / f"{fd}.png"),
                   rng.uniform(0, 255, (32, 40, 3)).astype(np.uint8))

    ds = FlyingThings3D(str(tmp_path), resize=(32, 32), train=False)
    aif, depth = ds[0]
    assert aif.shape == (3, 32, 32) and depth.shape == (1, 32, 32)

    ds2 = FlyingThings3D(str(tmp_path), resize=(32, 32), train=False, fs_num=2)
    stack, depth, fdists = ds2[0]
    assert stack.shape == (2, 3, 32, 32)
    assert fdists.shape == (2,)
    assert set(np.round(fdists * 20)).issubset({10.0, 20.0, 30.0})


def test_realworld_loader(tmp_path):
    import cv2 as cv

    from aadff_tpu.dff.dataset import RealWorld

    scene = tmp_path / "capture1" / "align"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(2)
    for fd in [600, 1200, 2400]:
        cv.imwrite(str(scene / f"img_dist{fd}_x.png"),
                   rng.uniform(0, 255, (32, 40, 3)).astype(np.uint8))
    ds = RealWorld(str(tmp_path), resize=(32, 32))
    stack, depth, fdists = ds[0]
    assert stack.shape == (3, 3, 32, 32)
    np.testing.assert_allclose(sorted(fdists), [0.6, 1.2, 2.4])


def test_quality_utils():
    import jax.numpy as jnp

    from aadff_tpu.utils.quality import (
        batch_LPIPS,
        denormalize_imagenet,
        normalize_imagenet,
        print_memory,
    )

    img = jnp.full((3, 8, 8), 0.5)
    norm = normalize_imagenet(img)
    back = denormalize_imagenet(norm)
    np.testing.assert_allclose(np.asarray(back), 0.5, atol=1e-6)
    # channel means differ after normalisation
    m = np.asarray(norm).mean(axis=(1, 2))
    assert len(set(np.round(m, 3))) == 3
    with pytest.raises(RuntimeError):
        batch_LPIPS(np.zeros((1, 3, 8, 8)), np.zeros((1, 3, 8, 8)))
    print_memory()  # must not raise


def test_step_timer():
    import time

    from aadff_tpu.utils.profiling import StepTimer

    t = StepTimer(window=4)
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    assert 10 < 1000 / t.steps_per_sec < 100  # ~10ms steps
