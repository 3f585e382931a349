"""Differentiable lens design: gradients flow and the design step reduces
the RMS-spot figure of merit on a perturbed singlet."""
import jax
import jax.numpy as jnp
import numpy as np

from aadff_tpu.optics import Lens, make_surface
from aadff_tpu.optics.optimize import (
    design_step_fn,
    lr_scale_tree,
    make_lens_optimizer,
    rms_spot_loss,
)


def _singlet():
    lens = Lens()
    p1, m1 = make_surface("spheric", r=8.0, d=0.0, c=1 / 45.0, mat1="air",
                          mat2="n-bk7")
    p2, m2 = make_surface("spheric", r=8.0, d=2.0, c=-1 / 500.0,
                          mat1="n-bk7", mat2="air")
    lens.params, lens.metas = (p1, p2), (m1, m2)
    lens.r_last = 8.0
    lens.d_sensor = 85.0
    lens.prepare_sensor((64, 64))
    lens.aper_idx = None
    lens.hfov = 0.09
    lens.foclen = lens.calc_efl()
    return lens


def test_lr_scale_tree_structure(rf50mm):
    scales = lr_scale_tree(rf50mm.params, rf50mm.metas)
    # stop surface frozen
    stop = scales[rf50mm.aper_idx]
    assert float(stop.c) == 0 and float(stop.d) == 0
    # aspheric surface: ai terms decay geometrically, ai2 frozen
    asp_idx = next(i for i, m in enumerate(rf50mm.metas) if m.kind == "aspheric")
    s = np.asarray(scales[asp_idx].ai)
    assert s[0] == 0 and s[1] > s[2] > s[3] > 0


def test_design_step_reduces_spot(rf50mm):
    lens = _singlet()
    optimizer = make_lens_optimizer(lens.params, lens.metas,
                                    lr=(1e-5, 1e-3, 0.0, 0.0))
    step = design_step_fn(lens, optimizer, depth=-10000.0, M=3, spp=256)
    params = lens.params
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)
    loss0 = float(rms_spot_loss(lens, params, depth=-10000.0, M=3, spp=256,
                                key=key))
    for i in range(30):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
    assert float(loss) < loss0, (float(loss), loss0)
    assert np.isfinite(float(loss))
