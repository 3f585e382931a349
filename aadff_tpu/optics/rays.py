"""Ray bundle pytree and pure propagation helpers.

Functional replacement for the reference mutable `Ray` class
(`deeplens/basics.py:215-295`).  A `RayBundle` is an immutable NamedTuple of
arrays so it threads through `jax.jit` / `lax.scan` / `vmap` without any object
state; "mutation" becomes `._replace(...)`.

Fields
    o      [..., 3]  positions [mm]
    d      [..., 3]  unit directions
    ra     [...]     validity mask (float 0/1, multiplied like the reference)
    en     [...]     spherical-wave energy decay (parity field, mostly unused)
    obliq  [...]     cumulative obliquity factor (cos of bend per refraction)
    opl    [...]     optical path length (coherent mode)
    phi    [...]     accumulated phase modulo 2*pi (coherent mode)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class RayBundle(NamedTuple):
    o: jnp.ndarray
    d: jnp.ndarray
    ra: jnp.ndarray
    en: jnp.ndarray
    obliq: jnp.ndarray
    opl: jnp.ndarray
    phi: jnp.ndarray


def make_rays(o, d, normalize: bool = True) -> RayBundle:
    """Build a ray bundle; directions are normalized like the reference ctor."""
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    if normalize:
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ones = jnp.ones(o.shape[:-1], jnp.float32)
    zeros = jnp.zeros(o.shape[:-1], jnp.float32)
    return RayBundle(o=o, d=d, ra=ones, en=ones, obliq=ones, opl=zeros, phi=zeros)


def propagate_to(ray: RayBundle, z, n: float = 1.0, coherent: bool = False,
                 wvln: float = 0.589) -> RayBundle:
    """Propagate rays to plane `z` (reference basics.py:255-273)."""
    t = (z - ray.o[..., 2]) / ray.d[..., 2]
    o = ray.o + ray.d * t[..., None]
    if not coherent:
        return ray._replace(o=o)
    opl = ray.opl + n * t
    k = 2 * np.pi / (wvln * 1e-3)
    phi = ray.phi + jnp.mod(n * k * (t - jnp.min(t, axis=0)), 2 * np.pi)
    return ray._replace(o=o, opl=opl, phi=phi)


def project_to(ray: RayBundle, z) -> jnp.ndarray:
    """Intersection (x, y) of each ray with plane `z` (basics.py:276-284)."""
    t = (z - ray.o[..., 2]) / ray.d[..., 2]
    return ray.o[..., 0:2] + ray.d[..., 0:2] * t[..., None]
