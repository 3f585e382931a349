"""Native C++ host ops: build, parity vs scipy/cv2, fallback behavior."""
import numpy as np
import pytest

from aadff_tpu.dff import native_ops as nop


@pytest.fixture(scope="module")
def have_native():
    if not nop.available():
        pytest.skip("native library not built and toolchain unavailable")
    return True


def test_rotate_matches_scipy_bilinear(have_native):
    from scipy.ndimage import rotate as sp_rotate

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    for angle in [0.0, 17.0, 133.5]:
        ref = sp_rotate(img, angle, reshape=False, order=1)
        out = nop.rotate(img, angle)
        np.testing.assert_allclose(out, ref, atol=1e-4)
    # exact 90 deg: samples land on the frame border, where scipy blends with
    # cval while we hard-clip — compare the interior only
    ref = sp_rotate(img, 90.0, reshape=False, order=1)
    out = nop.rotate(img, 90.0)
    np.testing.assert_allclose(out[1:-1, 1:-1], ref[1:-1, 1:-1], atol=1e-4)
    # 2D depth maps too
    d = rng.uniform(0.5, 3.0, (48, 64)).astype(np.float32)
    np.testing.assert_allclose(
        nop.rotate(d, 30.0), sp_rotate(d, 30.0, reshape=False, order=1),
        atol=1e-4,
    )


def test_resize_matches_cv2(have_native):
    import cv2 as cv

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
    ref = cv.resize(img, (28, 20), interpolation=cv.INTER_LINEAR)
    out = nop.resize(img, (20, 28))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_flip_and_jitter(have_native):
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (16, 20, 3)).astype(np.float32)
    np.testing.assert_array_equal(nop.flip(img, 0), img[::-1])
    np.testing.assert_array_equal(nop.flip(img, 1), img[:, ::-1])
    ref = np.clip(0.5 + 0.3 * (img - 0.5) + 0.2, 0, 1)
    np.testing.assert_allclose(nop.color_jitter(img, 0.3, 0.2), ref, atol=1e-6)


def test_augment_uses_native_rotation(have_native):
    """auto_augment still satisfies its invariants with the native kernel."""
    from aadff_tpu.dff.dataset import auto_augment

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (32, 32, 3))
    depth = rng.uniform(0.5, 3.0, (32, 32))

    class ForceRotate:
        def rand(self):
            return 0.9  # take every branch incl. rotation

        def randint(self, a, b):
            return 45

    img2, depth2 = auto_augment(img, depth, rng=ForceRotate())
    assert img2.shape == img.shape
    assert (depth2 >= 0).all()
    assert np.isfinite(img2).all()
