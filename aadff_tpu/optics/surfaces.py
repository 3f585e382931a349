"""Optical surface math: sag, Newton intersection, Snell refraction.

TPU-native functional rewrite of the reference `Aspheric` surface
(`deeplens/surfaces.py:281-830`).  One parameter pytree + static metadata
covers the three surface kinds (flat/stop, spheric, aspheric); the kind is
*static* so XLA sees straight-line code with no data-dependent branches.
Newton's method is a fixed-trip `lax.fori_loop` under `stop_gradient`, followed
by one differentiable update — the same "detach the iteration, re-attach
through one step" gradient semantics as surfaces.py:539-586.

All math is float32 and mask-based (invalid rays keep their old state), which
maps 1:1 onto the reference's boolean-mask style and onto the TPU VPU.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EPSILON
from .materials import Material
from .rays import RayBundle

# Reference tolerances (deeplens/surfaces.py:26-29)
NEWTONS_MAXITER = 10
NEWTONS_TOLERANCE_TIGHT = 10e-6  # [mm]
NEWTONS_TOLERANCE_LOOSE = 50e-6  # [mm]
NEWTONS_STEP_BOUND = 5.0  # [mm]

MAX_AI_TERMS = 8  # supports even-asphere coefficients ai2 .. ai16


class SurfaceParams(NamedTuple):
    """Differentiable per-surface parameters (a pytree of f32 scalars)."""

    c: jnp.ndarray  # curvature 1/roc
    d: jnp.ndarray  # z position of the vertex [mm]
    k: jnp.ndarray  # conic constant
    ai: jnp.ndarray  # [MAX_AI_TERMS] even asphere coeffs (zero padded)


@dataclasses.dataclass(frozen=True)
class SurfaceMeta:
    """Static (non-traced) surface description."""

    kind: str  # 'stop' | 'spheric' | 'aspheric'
    r: float  # clear aperture radius [mm]
    mat1: Material
    mat2: Material
    ai_degree: int
    k_gt_neg1: bool  # static sign info for the validity boundary
    is_square: bool = False

    def eta(self, wvln: float, forward: bool) -> float:
        n1, n2 = self.mat1.ior(wvln), self.mat2.ior(wvln)
        return (n1 / n2) if forward else (n2 / n1)

    def index_before(self, wvln: float, forward: bool) -> float:
        return self.mat1.ior(wvln) if forward else self.mat2.ior(wvln)


def make_surface(kind: str, r: float, d: float, c: float = 0.0, k: float = 0.0,
                 ai: Optional[Sequence[float]] = None, mat1: str = "air",
                 mat2: str = "air"):
    """Construct (params, meta) for one surface."""
    ai = list(ai) if ai is not None else []
    ai_pad = np.zeros(MAX_AI_TERMS, np.float32)
    ai_pad[: len(ai)] = ai
    params = SurfaceParams(
        c=jnp.float32(c), d=jnp.float32(d), k=jnp.float32(k), ai=jnp.asarray(ai_pad)
    )
    meta = SurfaceMeta(
        kind=kind,
        r=float(r),
        mat1=Material.create(mat1),
        mat2=Material.create(mat2),
        ai_degree=len(ai),
        k_gt_neg1=k > -1,
    )
    return params, meta


# --------------------------------------------------------------------------
# Sag and derivatives (reference surfaces.py:787-830)
# --------------------------------------------------------------------------
def sag_r2(r2, p: SurfaceParams, ai_degree: int):
    """z(r^2): conic base + even polynomial (reference `_g`)."""
    base = r2 * p.c / (1 + jnp.sqrt(1 - (1 + p.k) * r2 * p.c**2))
    poly = jnp.zeros_like(r2)
    # Horner over the active polynomial terms (static count -> unrolled)
    for i in reversed(range(ai_degree)):
        poly = (poly + p.ai[i]) * r2
    return base + poly


def dsag_dr2(r2, p: SurfaceParams, ai_degree: int):
    """d z / d r^2 (reference `_dgd`)."""
    sf = jnp.sqrt(1 - (1 + p.k) * r2 * p.c**2)
    ds = (1 + sf + (1 + p.k) * r2 * p.c**2 / 2 / sf) * p.c / (1 + sf) ** 2
    poly = jnp.zeros_like(r2)
    for i in reversed(range(ai_degree)):
        poly = poly * r2 + (i + 1) * p.ai[i]
    return ds + poly


def _valid_tight(x, y, p: SurfaceParams, meta: SurfaceMeta):
    """Ray lands inside the defined, clear part of the surface
    (reference surfaces.py:724-732)."""
    r2 = x**2 + y**2
    inside = r2 < meta.r**2
    if meta.k_gt_neg1:
        inside = inside & (r2 < (1 - EPSILON) / p.c**2 / (1 + p.k))
    return inside


def _valid_loose(x, y, p: SurfaceParams, meta: SurfaceMeta):
    """Surface shape is mathematically defined (reference surfaces.py:735-743)."""
    r2 = x**2 + y**2
    if meta.k_gt_neg1:
        return r2 < (1 - EPSILON) / p.c**2 / (1 + p.k)
    return r2 > 0


# --------------------------------------------------------------------------
# Newton intersection (reference surfaces.py:523-586)
# --------------------------------------------------------------------------
def newtons_method(ray: RayBundle, p: SurfaceParams, meta: SurfaceMeta):
    """Intersect rays with the surface; returns (valid, t).

    Fixed NEWTONS_MAXITER no-grad iterations + one gradient-carrying update,
    reproducing the reference's detach/re-attach trick exactly.
    """
    ox, oy, oz = ray.o[..., 0], ray.o[..., 1], ray.o[..., 2]
    dx, dy, dz = ray.d[..., 0], ray.d[..., 1], ray.d[..., 2]
    t0 = (p.d - oz) / dz

    def ft_dfdt(t, tight):
        new_o = ray.o + ray.d * t[..., None]
        nx, ny = new_o[..., 0], new_o[..., 1]
        if tight:
            valid = _valid_tight(nx, ny, p, meta) & (ray.ra > 0)
        else:
            valid = _valid_loose(nx, ny, p, meta) & (ray.ra > 0)
        vm = valid.astype(nx.dtype)
        xm, ym = nx * vm, ny * vm
        r2 = xm**2 + ym**2
        ft = sag_r2(r2, p, meta.ai_degree) + p.d - new_o[..., 2]
        dr2dt = 2 * ((dx**2 + dy**2) * t + (dx * ox + dy * oy))
        dfdt = dsag_dr2(r2, p, meta.ai_degree) * dr2dt - dz
        return ft, dfdt

    def body(_, t):
        ft, dfdt = ft_dfdt(t, tight=False)
        return t - jnp.clip(ft / (dfdt + EPSILON), -NEWTONS_STEP_BOUND, NEWTONS_STEP_BOUND)

    t_loop = jax.lax.fori_loop(0, NEWTONS_MAXITER, body, t0)
    t1 = jax.lax.stop_gradient(t_loop - t0)

    # One more iteration to re-gain gradient (reference surfaces.py:565-578)
    t = t0 + t1
    ft, dfdt = ft_dfdt(t, tight=True)
    t = t - jnp.clip(ft / (dfdt + EPSILON), -NEWTONS_STEP_BOUND, NEWTONS_STEP_BOUND)

    # Validity: inside clear aperture, converged, not travelling backwards
    new_o = jax.lax.stop_gradient(ray.o + ray.d * t[..., None])
    valid = (
        _valid_tight(new_o[..., 0], new_o[..., 1], jax.lax.stop_gradient(p), meta)
        & (jnp.abs(jax.lax.stop_gradient(ft)) < NEWTONS_TOLERANCE_TIGHT)
        & (ray.ra > 0)
        & (jax.lax.stop_gradient(t) > 0)
    )
    return valid, t


# --------------------------------------------------------------------------
# Surface normal (reference surfaces.py:589-630)
# --------------------------------------------------------------------------
def surface_normal(ray: RayBundle, p: SurfaceParams, meta: SurfaceMeta):
    x, y, z = ray.o[..., 0], ray.o[..., 1], ray.o[..., 2]
    if meta.kind == "stop":
        n = jnp.stack(
            [jnp.zeros_like(x), jnp.zeros_like(y), -jnp.ones_like(z)], axis=-1
        )
        return n
    if meta.kind == "spheric":
        R = 1 / p.c
        sgn = jnp.sign(p.c)
        nx = sgn * 2 * x
        ny = sgn * 2 * y
        nz = sgn * (2 * z - 2 * (p.d + R))
        n = jnp.stack([nx, ny, nz], axis=-1)
    else:  # aspheric
        vm = (ray.ra > 0).astype(x.dtype)
        xm, ym = x * vm, y * vm
        r2 = xm**2 + ym**2
        ds = dsag_dr2(r2, p, meta.ai_degree)
        n = jnp.stack([ds * 2 * xm, ds * 2 * ym, -jnp.ones_like(x)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


# --------------------------------------------------------------------------
# Snell refraction (reference surfaces.py:633-679)
# --------------------------------------------------------------------------
def refract(ray: RayBundle, p: SurfaceParams, meta: SurfaceMeta, eta: float,
            forward: bool) -> RayBundle:
    n = surface_normal(ray, p, meta)
    if forward:
        n = -n

    cosi = jnp.sum(ray.d * n, axis=-1)
    valid = (cosi**2 > 0.1) & (eta**2 * (1 - cosi**2) < 1) & (ray.ra > 0)
    vm = valid.astype(cosi.dtype)

    sr = jnp.sqrt(1 - eta**2 * (1 - cosi[..., None] ** 2) * vm[..., None])
    new_d = sr * n + eta * (ray.d - cosi[..., None] * n)
    new_d = jnp.where(valid[..., None], new_d, ray.d)

    old_d = jax.lax.stop_gradient(ray.d)
    obliq = ray.obliq * jnp.sum(new_d * old_d, axis=-1)
    return ray._replace(d=new_d, ra=ray.ra * vm, obliq=obliq)


# --------------------------------------------------------------------------
# Full surface interaction (reference surfaces.py:391-520)
# --------------------------------------------------------------------------
def ray_reaction(ray: RayBundle, p: SurfaceParams, meta: SurfaceMeta,
                 wvln: float, forward: bool, coherent: bool = False) -> RayBundle:
    """Intersect + refract one ray bundle with one surface (static kind)."""
    eta = meta.eta(wvln, forward)
    n_before = meta.index_before(wvln, forward)
    k_wave = 2 * np.pi / (wvln * 1e-3)

    if meta.kind == "stop":
        # Flat plane / aperture stop (reference surfaces.py:409-453)
        t = (p.d - ray.o[..., 2]) / ray.d[..., 2]
        new_o = ray.o + t[..., None] * ray.d
        if meta.is_square:
            valid = (
                (jnp.abs(new_o[..., 0]) <= meta.r)
                & (jnp.abs(new_o[..., 1]) <= meta.r)
                & (ray.ra > 0)
            )
        else:
            valid = (
                jnp.sqrt(new_o[..., 0] ** 2 + new_o[..., 1] ** 2) <= meta.r
            ) & (ray.ra > 0)
        o0 = ray.o
        o = jnp.where(valid[..., None], new_o, ray.o)
        ray = ray._replace(o=o)
        if coherent:
            # Standard OPD accumulation (reference surfaces.py:434-440)
            opl_std = jnp.where(valid, ray.opl + n_before * t, ray.opl)
            phi_std = jnp.where(
                valid,
                ray.phi + jnp.mod(n_before * k_wave * (t - jnp.min(t, axis=0)), 2 * np.pi),
                ray.phi,
            )
            # High-precision far-field branch (reference surfaces.py:429-432):
            # when every ray propagates > 100 mm to reach the plane, the
            # micron-scale OPD differences across the bundle drown in the
            # ~1e4 mm magnitude of n*t, so the reference instead projects the
            # new origin onto the incoming-origin direction,
            # opd = -(o_new . o0) / |o0|, applied unmasked and with no phase
            # update — reproduced verbatim.  `t.min() > 100` is data-dependent,
            # so inside jit this is a select over both (cheap) branches.
            # Safe-divide: the expression is evaluated for BOTH branches of
            # the select below, and grad through jnp.where backpropagates
            # NaN from the unselected branch — a ray whose origin sits at
            # the coordinate origin (|o0| = 0, e.g. an on-axis chief ray at
            # a d=0 first surface) would give 0/0 and poison every gradient
            # of a differentiated coherent trace even in near field.  When
            # the far-field branch IS selected, t.min() > 100 guarantees
            # |o0| >> 1, so the clamp never changes a selected value.
            o0_norm = jnp.sqrt(jnp.sum(o0 * o0, axis=-1))
            opd = -jnp.sum(o * o0, axis=-1) / jnp.maximum(o0_norm, EPSILON)
            far_field = jnp.min(t) > 100.0
            opl = jnp.where(far_field, ray.opl + opd, opl_std)
            phi = jnp.where(far_field, ray.phi, phi_std)
            ray = ray._replace(opl=opl, phi=phi)
        ray = ray._replace(ra=ray.ra * valid.astype(ray.ra.dtype))
        if eta != 1:
            ray = refract(ray, p, meta, eta, forward)
        return ray

    valid_n, t = newtons_method(ray, p, meta)
    new_o = ray.o + t[..., None] * ray.d

    if meta.kind == "spheric":
        # Spheric overrides the Newton validity (reference surfaces.py:460-479)
        valid = (
            (new_o[..., 0] ** 2 + new_o[..., 1] ** 2 <= meta.r**2)
            & (t >= 0)
            & (ray.ra > 0)
        )
    else:
        valid = valid_n

    o = jnp.where(valid[..., None], new_o, ray.o)
    ray = ray._replace(o=o)
    if coherent:
        opl = jnp.where(valid, ray.opl + n_before * t, ray.opl)
        phi = jnp.where(
            valid,
            ray.phi + jnp.mod(n_before * k_wave * (t - jnp.min(t, axis=0)), 2 * np.pi),
            ray.phi,
        )
        ray = ray._replace(opl=opl, phi=phi)
    ray = ray._replace(ra=ray.ra * valid.astype(ray.ra.dtype))
    return refract(ray, p, meta, eta, forward)
