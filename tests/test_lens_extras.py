"""Remaining geometrical-optics API: focus distance, infinity refocus,
sensor/parallel sampling, magnification consistency."""
import jax
import numpy as np
import pytest


def test_calc_foc_dist_consistent_with_refocus(rf50mm):
    """Refocus to a depth, then the traced object-space focus distance should
    come back near that depth (reference optics.py:1112-1131)."""
    from aadff_tpu.optics import Lens

    from conftest import LENS_RF50

    lens = Lens(LENS_RF50, sensor_res=(480, 640))
    lens.refocus(-2000.0)
    fd = lens.calc_foc_dist(key=jax.random.PRNGKey(0))
    assert -2300 < fd < -1700, fd


def test_refocus_inf(rf50mm):
    from aadff_tpu.optics import Lens

    from conftest import LENS_RF50

    lens = Lens(LENS_RF50, sensor_res=(480, 640))
    d0 = lens.d_sensor  # JSON ships focused near infinity
    lens.refocus(-500.0)
    assert lens.d_sensor > d0  # close focus moves the sensor back
    lens.refocus_inf()
    assert abs(lens.d_sensor - d0) < 0.2


def test_sample_sensor_shapes(rf50mm):
    ray = rf50mm.sample_sensor(spp=4, key=jax.random.PRNGKey(0))
    H, W = rf50mm.sensor_res
    assert ray.o.shape == (4, H, W, 3)
    # rays leave the sensor plane toward the lens (backward, -z)
    assert float(ray.d[..., 2].max()) < 0
    assert np.allclose(np.asarray(ray.o[..., 2]), rf50mm.d_sensor)


def test_sample_parallel_grid(rf50mm):
    ray = rf50mm.sample_parallel(fov=5.0, M=7, entrance_pupil=True,
                                 key=jax.random.PRNGKey(1))
    assert ray.o.shape == (7, 7, 3)
    d = np.asarray(ray.d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    assert np.allclose(d[..., 0], np.sin(np.radians(5.0)), atol=1e-6)


def test_magnification_matches_pinhole_at_far_depth(rf50mm):
    """At -20 m the ray-traced magnification approaches the pinhole model."""
    mag = rf50mm.calc_magnification3(-20000.0, key=jax.random.PRNGKey(2))
    pin = 1 / rf50mm.calc_scale_pinhole(-20000.0)
    assert abs(mag - pin) / abs(pin) < 0.05, (mag, pin)


def test_sample_pupil_stratified(rf50mm):
    """Stratified ring sampling: r^2 uniform on the disc, all sectors hit
    (reference optics.py:539-591)."""
    import jax

    o = rf50mm.sample_pupil(res=(2, 2), spp=64, key=jax.random.PRNGKey(0))
    assert o.shape == (64, 2, 2, 3)
    pz, pr = rf50mm.entrance_pupil()
    x, y = np.asarray(o[..., 0]).ravel(), np.asarray(o[..., 1]).ravel()
    r2 = x**2 + y**2
    assert r2.max() <= pr**2 + 1e-4
    # uniform-in-area: mean of r^2 ~ pr^2/2
    assert abs(r2.mean() - pr**2 / 2) < 0.08 * pr**2
    theta = np.arctan2(y, x)
    hist, _ = np.histogram(theta, bins=8, range=(-np.pi, np.pi))
    assert (hist > 0).all()  # every sector sampled
    np.testing.assert_allclose(np.asarray(o[..., 2]), pz, atol=1e-5)
