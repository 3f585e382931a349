"""Misc parity: coherent trace bookkeeping, lens JSON roundtrip, perturb."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from aadff_tpu.optics import Lens, make_rays
from aadff_tpu.optics.psf import assign_points_to_pixels

from conftest import LENS_RF50


def test_coherent_trace_accumulates_opl(rf50mm):
    """Coherent mode tracks optical path length / phase through the stack."""
    o = jnp.asarray([[0.5, 0.0, -1000.0], [1.5, 0.5, -1000.0]])
    tgt = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    ray = make_rays(o, tgt - o)
    out, valid, _ = rf50mm.trace(ray, coherent=True)
    assert bool(valid.all())
    opl = np.asarray(out.opl)
    assert (opl > 0).all() and np.isfinite(opl).all()
    phi = np.asarray(out.phi)
    assert np.isfinite(phi).all()


def _stop_parity_case(z_src, n_rays=48, r_stop=4.0, seed=7):
    """Run the same coherent ray bundle through the reference torch stop
    surface and our stop `ray_reaction`; return both output rays."""
    import torch

    from aadff_tpu.constants import DEFAULT_WAVE
    from aadff_tpu.optics.surfaces import make_surface, ray_reaction
    from conftest import import_reference

    basics_ref = import_reference("deeplens.basics")
    surfaces_ref = import_reference("deeplens.surfaces")

    rng = np.random.default_rng(seed)
    o = np.stack([rng.uniform(-3, 3, n_rays), rng.uniform(-3, 3, n_rays),
                  np.full(n_rays, z_src)], -1).astype(np.float32)
    # targets spill past the stop radius so some rays get masked out
    tgt = np.stack([rng.uniform(-1.5 * r_stop, 1.5 * r_stop, n_rays),
                    rng.uniform(-1.5 * r_stop, 1.5 * r_stop, n_rays),
                    np.zeros(n_rays)], -1).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    ray_t = basics_ref.Ray(torch.tensor(o), torch.tensor(d), coherent=True,
                           device="cpu")
    surf = surfaces_ref.Aspheric(r_stop, 0.0, c=0.0, mat1="air", mat2="air",
                                 device="cpu")
    out_ref = surf.ray_reaction(ray_t)

    params, meta = make_surface("stop", r=r_stop, d=0.0)
    out = ray_reaction(make_rays(o, d), params, meta, wvln=DEFAULT_WAVE,
                       forward=True, coherent=True)
    return out, out_ref


def test_coherent_stop_far_field_opd_matches_reference():
    """Far-field (t.min() > 100 mm) coherent propagation to a flat stop uses
    the high-precision projection OPD, opd = -(o_new . o0)/|o0|, applied
    unmasked with no phase update (reference surfaces.py:429-432)."""
    out, out_ref = _stop_parity_case(z_src=-1000.0)
    assert out_ref.ra.numpy().sum() < out_ref.ra.numpy().size  # masking hit
    np.testing.assert_allclose(np.asarray(out.ra), out_ref.ra.numpy())
    np.testing.assert_allclose(np.asarray(out.o), out_ref.o.numpy(), atol=1e-4)
    # |opl| ~ 1e3 mm in f32: allow a few ulps at that magnitude
    np.testing.assert_allclose(np.asarray(out.opl), out_ref.opl.numpy(),
                               rtol=1e-6, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.phi), out_ref.phi.numpy(),
                               atol=1e-6)  # phase untouched in this branch


def test_coherent_stop_near_field_opd_matches_reference():
    """Near-field (t.min() <= 100 mm) keeps the masked opl += n*t / phase
    accumulation (reference surfaces.py:434-440)."""
    out, out_ref = _stop_parity_case(z_src=-50.0)
    np.testing.assert_allclose(np.asarray(out.ra), out_ref.ra.numpy())
    np.testing.assert_allclose(np.asarray(out.opl), out_ref.opl.numpy(),
                               rtol=1e-6, atol=1e-4)
    # phi wraps a ~1e4 rad argument mod 2*pi in f32: compare on the circle
    dphi = np.asarray(out.phi) - out_ref.phi.numpy()
    np.testing.assert_allclose(np.abs(np.exp(1j * dphi) - 1.0), 0.0, atol=0.02)


def test_coherent_psf_accumulation():
    """Complex (coherent) splat: |sum|^2-style accumulation stays consistent
    with the incoherent path when all phases are zero."""
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (64, 2)).astype(np.float32))
    ra = jnp.ones(64)
    ks, rngs = 7, (-3.0, 3.0)
    inc = assign_points_to_pixels(pts, ks, rngs, rngs, ra)
    coh = assign_points_to_pixels(pts, ks, rngs, rngs, ra, coherent=True,
                                  phase=jnp.zeros(64))
    np.testing.assert_allclose(np.asarray(coh.real), np.asarray(inc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(coh.imag), 0.0, atol=1e-5)


def test_lens_json_roundtrip(tmp_path):
    lens = Lens(LENS_RF50, sensor_res=(480, 640))
    out_path = str(tmp_path / "lens.json")
    lens.write_lens_json(out_path)
    lens2 = Lens(out_path, sensor_res=(480, 640))
    assert abs(lens2.foclen - lens.foclen) < 1e-3
    assert abs(lens2.d_sensor - lens.d_sensor) < 1e-6
    for p1, p2 in zip(lens.params, lens2.params):
        assert abs(float(p1.c) - float(p2.c)) < 1e-7
        np.testing.assert_allclose(np.asarray(p1.ai), np.asarray(p2.ai),
                                   atol=1e-9)
    with open(out_path) as f:
        data = json.load(f)
    assert data["surfaces"][5]["type"] == "Stop"


def test_perturb_changes_params():
    lens = Lens(LENS_RF50, sensor_res=(480, 640))
    c0 = [float(p.c) for p in lens.params]
    lens.perturb(rng=np.random.default_rng(0))
    c1 = [float(p.c) for p in lens.params]
    changed = sum(abs(a - b) > 0 for a, b in zip(c0, c1) if a != 0)
    assert changed > 0
    # perturbation is small (manufacturing scale)
    for a, b in zip(c0, c1):
        if a != 0:
            assert abs(a - b) / abs(a) < 0.01


def test_prune_surf_keeps_rays_valid():
    lens = Lens(LENS_RF50, sensor_res=(480, 640))
    r_before = [m.r for m in lens.metas]
    lens.prune_surf()
    r_after = [m.r for m in lens.metas]
    # pruning shrinks or keeps surfaces (aperture untouched)
    assert all(b <= max(a, lens.r_last) + 1.2 for a, b in zip(r_before, r_after))
    # lens still traces: on-axis point source keeps most rays
    o = jnp.asarray([[0.0, 0.0, -5000.0]])
    tgt = jnp.asarray([[0.0, 0.0, 0.0]])
    ray = make_rays(jnp.broadcast_to(o, (16, 3)),
                    jnp.broadcast_to(tgt - o, (16, 3)))
    out, valid, _ = lens.trace(ray)
    assert bool(np.asarray(valid).all())


def test_pruning_v2_surface_range_and_cache_invalidation():
    """pruning_v2 honours an explicit surface_range (reference
    optics.py:1457-1501) and aperture mutations invalidate the focus cache
    so a later refocus() reflects the new geometry."""
    lens = Lens(LENS_RF50, sensor_res=(480, 640))
    subset = lens.find_diff_surf()[:2]
    r_before = [m.r for m in lens.metas]
    lens.pruning_v2(surface_range=subset)
    r_after = [m.r for m in lens.metas]
    untouched = [i for i in range(len(r_before))
                 if i not in subset and i != lens.aper_idx]
    assert all(r_before[i] == r_after[i] for i in untouched)

    # focus-cache invalidation: refocus, mutate the aperture, refocus again
    lens2 = Lens(LENS_RF50, sensor_res=(480, 640))
    lens2.refocus(-2400.0)
    _, pupil_r_before = lens2.entrance_pupil()
    lens2.set_aperture(fnum=8.0)
    lens2.refocus(-2400.0)  # previously cached depth
    _, pupil_r_after = lens2.entrance_pupil()
    assert pupil_r_after < pupil_r_before * 0.6  # f/1.87 -> f/8 shrinks pupil


def test_modulate_siren_shapes_and_range():
    """ModulateSiren decodes a latent into a tanh image [1, C, H, W]
    (reference psfnet_arch.py:168-248)."""
    import jax

    from aadff_tpu.psfnet import ModulateSiren

    model = ModulateSiren(dim_out=1, dim_hidden=64, dim_latent=16,
                          num_layers=3, image_width=24, image_height=16)
    latent = jnp.asarray(np.random.default_rng(0).normal(size=(16,)),
                         jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), latent)
    out = model.apply(variables, latent)
    assert out.shape == (1, 1, 16, 24)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0
    # modulation actually modulates: different latents give different images
    out2 = model.apply(variables, latent + 1.0)
    assert np.abs(np.asarray(out - out2)).max() > 1e-4


def test_set_aperture_and_correct_shape():
    from aadff_tpu.optics import Lens

    from conftest import LENS_RF50

    lens = Lens(LENS_RF50, sensor_res=(480, 640))
    lens.set_aperture(fnum=4.0)
    r = lens.metas[lens.aper_idx].r
    assert abs(r - lens.foclen / 4.0 / 2) < 1e-6
    assert abs(lens.fnum - lens.foclen / r / 2) < 1e-6

    lens2 = Lens(LENS_RF50, sensor_res=(480, 640))
    changed = lens2.correct_shape()
    # a well-formed lens needs no ordering fixes; first surface moves to z=0
    assert changed is False
    assert abs(float(lens2.params[0].d)) < 1e-6
