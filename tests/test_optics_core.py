"""Optics-core oracles: analytic refraction, golden trace parity, lens derived
quantities (SURVEY.md §4 oracles (a) and (b))."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from aadff_tpu.constants import WAVE_RGB
from aadff_tpu.optics import Lens, Material, make_rays, make_surface, ray_reaction
from aadff_tpu.optics.rays import propagate_to

from conftest import LENS_50F28, LENS_RF50


# --------------------------------------------------------------------------
# Materials
# --------------------------------------------------------------------------
def test_material_sellmeier_bk7():
    m = Material.create("n-bk7")
    # Independently computed from the Sellmeier equation at 0.589 um
    n = m.ior(0.589)
    assert abs(n - 1.5168) < 2e-4


def test_material_nv_string():
    m = Material.create("1.83481/42.7")
    assert abs(m.ior(0.5893) - 1.83481) < 5e-4
    # dispersion: blue index > red index
    assert m.ior(0.486) > m.ior(0.656)


def test_material_schott():
    m = Material.create("pmma")
    assert abs(m.ior(0.5893) - 1.4918) < 2e-3


# --------------------------------------------------------------------------
# Single-surface analytic oracles
# --------------------------------------------------------------------------
def test_snell_flat_glass_interface():
    """Flat air->glass interface: Snell's law in closed form."""
    n2 = 1.5
    p, meta = make_surface("stop", r=10.0, d=5.0, c=0.0, mat1="air", mat2=f"{n2}/50")
    ang_i = 0.3
    d = [math.sin(ang_i), 0.0, math.cos(ang_i)]
    ray = make_rays(jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([d]))
    out = ray_reaction(ray, p, meta, wvln=0.5893, forward=True)
    sin_t = float(out.d[0, 0])
    expected = math.sin(ang_i) / n2
    assert abs(sin_t - expected) < 1e-5
    assert float(out.ra[0]) == 1.0


def test_sphere_intersection_analytic():
    """Newton intersection on a sphere matches the quadratic solution."""
    c = 0.05  # roc 20mm
    p, meta = make_surface("spheric", r=8.0, d=10.0, c=c, mat1="air", mat2="n-bk7")
    x0 = 3.0
    ray = make_rays(jnp.asarray([[x0, 0.0, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]]))
    out = ray_reaction(ray, p, meta, wvln=0.5893, forward=True)
    # sag of sphere at r=3: z = d + R - sqrt(R^2 - r^2)
    R = 1 / c
    z_expected = 10.0 + R - math.sqrt(R**2 - x0**2)
    assert abs(float(out.o[0, 2]) - z_expected) < 1e-5
    assert abs(float(out.o[0, 0]) - x0) < 1e-6


def test_paraxial_focal_length_single_lens():
    """Thin plano-convex lens: f = R/(n-1) paraxially."""
    n = 1.5
    R = 50.0
    p1, m1 = make_surface("spheric", r=10.0, d=0.0, c=1 / R, mat1="air", mat2=f"{n}/60")
    p2, m2 = make_surface("stop", r=10.0, d=1.0, c=0.0, mat1=f"{n}/60", mat2="air")
    lens = Lens()
    lens.params, lens.metas = (p1, p2), (m1, m2)
    h = 0.05  # paraxial ray height
    ray = make_rays(
        jnp.asarray([[h, 0.0, -1.0]]), jnp.asarray([[0.0, 0.0, 1.0]])
    )
    out, valid, _ = lens.trace(ray, forward=True)
    # focus where x crosses 0
    t = -float(out.o[0, 0]) / float(out.d[0, 0])
    z_focus = float(out.o[0, 2]) + float(out.d[0, 2]) * t
    # thick-lens paraxial: BFD = f (1 - t(n-1)/(nR)), measured from the back
    # surface at z = t
    f = R / (n - 1)
    thickness = 1.0
    z_expected = thickness + f * (1 - thickness * (n - 1) / (n * R))
    assert abs(z_focus - z_expected) < 0.02


# --------------------------------------------------------------------------
# Golden parity vs the PyTorch reference
# --------------------------------------------------------------------------
@pytest.mark.parametrize("lens_file,key", [(LENS_RF50, "rf50mm"), (LENS_50F28, "50mm_f2_8")])
def test_lens_derived_quantities(goldens, lens_file, key):
    lens = Lens(lens_file, sensor_res=(480, 640))
    foclen, fnum, hfov, d_sensor = goldens[f"{key}_derived"]
    assert abs(lens.foclen - foclen) < 1e-3
    assert abs(lens.fnum - fnum) < 1e-3
    assert abs(lens.hfov - hfov) < 1e-4
    assert abs(lens.d_sensor - d_sensor) < 1e-9
    pz, pr = goldens[f"{key}_pupil"]
    z, r = lens.entrance_pupil()
    assert abs(z - pz) < 1e-3 and abs(r - pr) < 1e-3


@pytest.mark.parametrize("lens_file,key", [(LENS_RF50, "rf50mm"), (LENS_50F28, "50mm_f2_8")])
@pytest.mark.parametrize("wvln", WAVE_RGB)
def test_trace_golden_parity(goldens, lens_file, key, wvln):
    """Identical input rays -> identical sensor-plane endpoints vs reference."""
    lens = Lens(lens_file, sensor_res=(480, 640))
    o = goldens[f"{key}_ray_o_in"]
    d = goldens[f"{key}_ray_d_in"]
    ray = make_rays(jnp.asarray(o), jnp.asarray(d))
    out = lens.trace2sensor(ray, wvln=wvln)

    w = str(wvln).replace(".", "")
    ra_ref = goldens[f"{key}_w{w}_ra"]
    o_ref = goldens[f"{key}_w{w}_o"]
    d_ref = goldens[f"{key}_w{w}_d"]

    ra = np.asarray(out.ra)
    assert (ra == ra_ref).mean() > 0.999, "validity masks diverge"
    m = (ra > 0) & (ra_ref > 0)
    # f32 accumulation order differs across backends (XLA-CPU vs torch);
    # 1e-3 mm = 1 um at the sensor, ~2% of a pixel — physically negligible
    np.testing.assert_allclose(np.asarray(out.o)[m], o_ref[m], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.d)[m], d_ref[m], atol=2e-5)
    obliq_ref = goldens[f"{key}_w{w}_obliq"]
    np.testing.assert_allclose(np.asarray(out.obliq)[m], obliq_ref[m], atol=1e-4)


@pytest.mark.parametrize("lens_file,key", [(LENS_RF50, "rf50mm"), (LENS_50F28, "50mm_f2_8")])
def test_refocus_golden(goldens, lens_file, key):
    """Refocused sensor position matches the reference within MC noise."""
    for depth in [-500.0, -2400.0, -20000.0]:
        lens = Lens(lens_file, sensor_res=(480, 640))
        lens.refocus(depth)
        d_ref, hfov_ref, fnum_ref = goldens[f"{key}_refocus_{-int(depth)}"]
        # refocus is a Monte-Carlo least-squares over 2048 random rays; RNG
        # differs across frameworks so compare within the MC std (~1e-2 mm)
        assert abs(lens.d_sensor - d_ref) < 2e-2, (depth, lens.d_sensor, d_ref)
        assert abs(lens.hfov - hfov_ref) < 1e-3
        assert abs(lens.fnum - fnum_ref) < 2e-2


def test_refocus_cache(rf50mm):
    import copy

    lens = Lens(LENS_RF50, sensor_res=(480, 640))
    lens.refocus(-1500.0)
    d1 = lens.d_sensor
    lens.refocus(-500.0)
    lens.refocus(-1500.0)  # cached path
    assert lens.d_sensor == d1


def test_backward_trace_roundtrip(rf50mm):
    """Forward trace then reverse the exit ray: must come back to the object."""
    lens = rf50mm
    o = jnp.asarray([[1.0, 0.5, -3000.0]])
    tgt = jnp.asarray([[0.0, 0.0, float(lens.params[0].d)]])
    ray = make_rays(o, tgt - o)
    out = lens.trace2sensor(ray)
    assert float(out.ra[0]) == 1.0
    back = make_rays(out.o, -out.d)
    back_out, _, _ = lens.trace(back, forward=False)
    back_out = propagate_to(back_out, -3000.0)
    assert float(back_out.ra[0]) == 1.0
    np.testing.assert_allclose(np.asarray(back_out.o[0, :2]), [1.0, 0.5], atol=1e-3)
