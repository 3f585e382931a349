"""PSF oracles: rasteriser golden parity, conservation, full-pipeline
statistical parity vs the reference (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from aadff_tpu.optics import Lens, make_rays
from aadff_tpu.optics.psf import (
    assign_points_to_pixels,
    forward_integral,
    lens_psf,
    lens_psf_rgb,
    make_grid_psf,
    psf2mtf,
)
from aadff_tpu.optics.rays import RayBundle

from conftest import LENS_RF50


def _ray_from_golden(goldens, key, w):
    o = jnp.asarray(goldens[f"{key}_w{w}_o"])
    d = jnp.asarray(goldens[f"{key}_w{w}_d"])
    ra = jnp.asarray(goldens[f"{key}_w{w}_ra"])
    ones = jnp.ones_like(ra)
    zeros = jnp.zeros_like(ra)
    return RayBundle(o=o, d=d, ra=ra, en=ones, obliq=ones, opl=zeros, phi=zeros)


def test_forward_integral_golden(goldens, rf50mm):
    """Identical traced rays -> identical rasterised PSF vs reference
    (isolates the matmul splat against index_put_ scatter-add)."""
    ray = _ray_from_golden(goldens, "rf50mm", "0589")
    pointc = jnp.asarray(goldens["rf50mm_fi_pointc"])
    psf = forward_integral(ray, ps=rf50mm.pixel_size, ks=11, pointc_ref=pointc)
    np.testing.assert_allclose(
        np.asarray(psf), goldens["rf50mm_fi_psf"], atol=1e-3, rtol=1e-4
    )


def test_assign_points_matches_manual():
    """Hat-matmul splat equals a hand-computed bilinear scatter."""
    pts = jnp.asarray([[0.0, 0.0], [0.3, -0.2]])
    ra = jnp.asarray([1.0, 0.5])
    ks, ps = 5, 1.0
    rng = ((-ks / 2 + 0.5) * ps, (ks / 2 - 0.5) * ps)
    grid = np.zeros((ks, ks))
    for (x, y), w in zip(np.asarray(pts), np.asarray(ra)):
        r = (y - rng[1]) / (rng[0] - rng[1]) * (ks - 1)
        c = (x - rng[0]) / (rng[1] - rng[0]) * (ks - 1)
        r0, c0 = int(np.floor(r)), int(np.floor(c))
        fr, fc = r - r0, c - c0
        grid[r0, c0] += (1 - fr) * (1 - fc) * w
        grid[r0, c0 + 1] += (1 - fr) * fc * w
        grid[r0 + 1, c0] += fr * (1 - fc) * w
        grid[r0 + 1, c0 + 1] += fr * fc * w
    out = assign_points_to_pixels(pts, ks, rng, rng, ra)
    np.testing.assert_allclose(np.asarray(out), grid, atol=1e-6)


def test_psf_sums_to_one(rf50mm):
    pts = jnp.asarray([[0.0, 0.0, -2400.0], [0.5, -0.5, -5000.0]])
    psf = lens_psf(rf50mm, pts, ks=11, spp=2048, key=jax.random.PRNGKey(0))
    sums = np.asarray(psf.sum(axis=(-1, -2)))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)
    assert (np.asarray(psf) >= 0).all()


def test_psf_diff_statistical_parity(goldens):
    """Full pipeline (refocus -> sample -> trace -> rasterise -> normalize)
    matches the reference PSF within Monte-Carlo noise (RNG-independent)."""
    lens = Lens(LENS_RF50, sensor_res=(480, 640))
    lens.refocus(-2400.0)
    d_ref, hfov_ref, fnum_ref = goldens["rf50mm_psf_diff_state"]
    assert abs(lens.d_sensor - d_ref) < 2e-2

    pts = jnp.asarray(
        [[0.0, 0.0, -2400.0], [0.6, 0.6, -5000.0], [-0.9, 0.3, -800.0]]
    )
    psf = lens_psf(lens, pts, ks=11, spp=32768, key=jax.random.PRNGKey(3))
    psf_ref = goldens["rf50mm_psf_diff"]
    # per-cell MC std at spp=32k is ~2e-3; allow 4 sigma plus center offset noise
    assert np.abs(np.asarray(psf) - psf_ref).max() < 2.5e-2
    assert np.abs(np.asarray(psf) - psf_ref).mean() < 3e-3


def test_psf_gradient_flows(rf50mm):
    """PSF is differentiable w.r.t. surface curvature (lens-design path)."""
    lens = rf50mm
    pts = jnp.asarray([[0.0, 0.0, -2400.0]])

    def loss_fn(params):
        from aadff_tpu.optics.psf import _psf_impl

        pupilz, pupilr = lens.entrance_pupil()
        psf = _psf_impl(
            params, lens.metas, pts, jax.random.PRNGKey(0), 11, 512, 0.589,
            True, tuple(range(len(lens.metas))),
            jnp.float32(lens.d_sensor), jnp.float32(pupilz), jnp.float32(pupilr),
            jnp.float32(lens.hfov), jnp.float32(lens.r_last),
            jnp.float32(lens.sensor_size[1]), jnp.float32(lens.sensor_size[0]),
            jnp.float32(lens.pixel_size),
        )
        return jnp.sum(psf**2)

    grads = jax.grad(loss_fn)(lens.params)
    gnorm = sum(float(jnp.abs(g.c)) for g in grads)
    assert np.isfinite(gnorm) and gnorm > 0


def test_make_grid_and_mtf(rf50mm):
    psfs = jnp.ones((4, 3, 11, 11))
    grid = make_grid_psf(psfs, nrow=2)
    assert grid.shape == (3, 22, 22)
    psf = lens_psf(rf50mm, jnp.asarray([0.0, 0.0, -2400.0]), ks=32, spp=1024,
                   key=jax.random.PRNGKey(1))
    freq, mtf_t, mtf_s = psf2mtf(psf, rf50mm.pixel_size)
    assert mtf_t.max() <= 1.0 and mtf_s.max() <= 1.0 and len(freq) > 0


def test_psf_center_false_perspective(rf50mm):
    """center=False uses the perspective PSF centre (reference optics.py:970-975):
    off-axis PSFs shift relative to chief-ray centring but stay normalised."""
    pts = jnp.asarray([[0.6, 0.6, -2400.0]])
    a = lens_psf(rf50mm, pts, ks=11, spp=2048, center=True,
                 key=jax.random.PRNGKey(0))
    b = lens_psf(rf50mm, pts, ks=11, spp=2048, center=False,
                 key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(a.sum()), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.sum()), 1.0, atol=1e-4)
    # centroids differ (distortion shifts the perspective centre)
    def centroid(p):
        g = np.arange(11)
        p = np.asarray(p[0])
        return (p.sum(0) @ g, p.sum(1) @ g)
    assert not np.allclose(centroid(a), centroid(b), atol=0.05)


def test_psf_second_lens(rf50mm):
    """All-spheric 50mm f/2.8 lens: PSFs normalised and finite."""
    from aadff_tpu.optics import Lens

    from conftest import LENS_50F28

    lens = Lens(LENS_50F28, sensor_res=(480, 640))
    psf = lens_psf(lens, jnp.asarray([[0.3, -0.4, -3000.0]]), ks=11, spp=2048,
                   key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(psf)).all()
    np.testing.assert_allclose(np.asarray(psf.sum()), 1.0, atol=1e-5)


def test_evaluate_psf_score_scanned_gate():
    """The quality gate (reference psfnet.py:305-369) runs as one scanned
    program and reproduces the shipped checkpoint's error band on a reduced
    lattice (full-lattice artifact: PSF_GATE.json)."""
    from aadff_tpu.psfnet import PSFNet

    import os

    net = PSFNet("/root/reference/lenses/rf50mm/lens.json", kernel_size=11,
                 sensor_res=(480, 640))
    net.load_net(os.path.join(os.path.dirname(__file__), "..",
                              "ckpt/rf50mm/psfnet_480x640_ks11.msgpack"))
    l1, l2 = net.evaluate_psf_score(spp=512, n_z=2, foc_subset=[0, 9, 19])
    assert 0 < l1 < 0.05, l1
    assert 0 < l2 < 1e-3, l2
