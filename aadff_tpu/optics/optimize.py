"""Differentiable lens design: per-parameter learning rates + design steps.

Counterpart of the reference's per-surface optimisation API
(`Aspheric.get_optimizer_params`, surfaces.py:865-923, and
`activate_grad`, surfaces.py:837-862).  The reference builds torch param
groups with per-term learning rates (c, d, k, ai with geometric decay); here
the same policy is an optax multi-transform over the `SurfaceParams` pytree —
the tracer is differentiable end-to-end, so any scalar figure of merit
(RMS spot, PSF MSE, ...) can drive the surfaces.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..constants import DEFAULT_WAVE
from .surfaces import SurfaceParams


def lr_scale_tree(params: Tuple[SurfaceParams, ...], metas,
                  lr=(1e-4, 1e-4, 1e-1, 1e-4), decay: float = 0.1,
                  optimize_aperture: bool = False):
    """Per-leaf learning-rate multipliers mirroring the reference policy:
    lr = [lr_c, lr_d, lr_k, lr_ai]; ai terms decay geometrically
    (ai4 full, ai6 *decay, ai8 *decay^2, ...); frozen leaves get 0."""
    if isinstance(lr, float):
        lr = [lr, lr, lr * 1e3, lr]
    scales = []
    for p, m in zip(params, metas):
        freeze = (m.kind == "stop") and not optimize_aperture
        c_s = 0.0 if (freeze or float(p.c) == 0) else lr[0]
        d_s = 0.0 if freeze else lr[1]
        k_s = 0.0 if (freeze or float(p.k) == 0) else lr[2]
        ai_s = np.zeros(p.ai.shape, np.float32)
        if not freeze and m.ai_degree > 0:
            for i in range(1, m.ai_degree):  # skip ai2 like the reference
                ai_s[i] = lr[3] * decay ** (i - 1)
        scales.append(
            SurfaceParams(
                c=jnp.float32(c_s), d=jnp.float32(d_s), k=jnp.float32(k_s),
                ai=jnp.asarray(ai_s),
            )
        )
    return tuple(scales)


def make_lens_optimizer(params, metas, lr=(1e-4, 1e-4, 1e-1, 1e-4),
                        decay: float = 0.1):
    """Adam with the reference's per-parameter learning-rate structure."""
    scales = lr_scale_tree(params, metas, lr, decay)

    def scale_update(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    scaler = optax.GradientTransformation(lambda _: optax.EmptyState(),
                                          scale_update)
    return optax.chain(optax.scale_by_adam(), scaler, optax.scale(-1.0))


def rms_spot_loss(lens, params, wvln=DEFAULT_WAVE, depth=-20000.0, M=5,
                  spp=256, key=None):
    """Differentiable mean-square spot radius at a field grid (the classic
    lens-design figure of merit; matches analysis_rms up to the sqrt)."""
    from .lens import _trace_impl
    from .rays import make_rays, project_to

    key = jax.random.PRNGKey(0) if key is None else key
    pupilz, pupilr = lens.entrance_pupil()
    scale = lens.calc_scale_pinhole(depth)
    xs = np.linspace(-0.7, 0.7, M, dtype=np.float32) * scale * lens.sensor_size[1] / 2
    pts = jnp.asarray(
        np.stack([xs, np.zeros_like(xs), np.full_like(xs, depth)], axis=-1)
    )
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (spp,)) * 2 * np.pi
    r = jnp.sqrt(jax.random.uniform(k2, (spp,)) * pupilr**2)
    o2 = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta),
                    jnp.full_like(theta, pupilz)], axis=1)
    o = jnp.broadcast_to(pts[None], (spp, M, 3))
    ray = make_rays(o, o2[:, None, :] - o)
    ray, _ = _trace_impl(ray, params, lens.metas, float(wvln), True, False,
                         tuple(range(len(lens.metas))), False)
    p = project_to(ray, lens.d_sensor)
    ra = ray.ra
    center = jnp.sum(p * ra[..., None], axis=0) / (jnp.sum(ra, axis=0)[..., None] + 1e-9)
    d2 = jnp.sum((p - center) ** 2, axis=-1) * ra
    return jnp.sum(d2) / (jnp.sum(ra) + 1e-9)


def design_step_fn(lens, optimizer, loss_fn=rms_spot_loss, **loss_kw):
    """Build a jitted (params, opt_state, key) -> (params, opt_state, loss)
    design step."""

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(lens, p, key=key, **loss_kw)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
