"""Lens system: JSON IO, ray sampling, tracing, pupils, focusing, geometry.

TPU-native rewrite of the reference `Lensgroup` (`deeplens/optics.py:22-2070`).

Design
------
* Surface parameters live in a tuple of `SurfaceParams` pytrees; everything
  else about a surface is static `SurfaceMeta`.  The hot path (`trace`) is a
  single jitted function whose Python loop over surfaces unrolls at trace time
  — XLA sees straight-line fused vector code, keyed on the static metas.
* The reference mutates `d_sensor` on `refocus` and recomputes pupils with an
  O(M^2) Python loop; here `refocus` is a fast vectorized solve and its results
  (per focus distance) are memoised in `self._focus_cache`, so repeated
  refocusing — the inner loop of PSF-net training — costs a dict lookup.
* Random sampling takes explicit `jax.random` keys (the lens also owns a key
  for reference-style convenience calls).
"""
from __future__ import annotations

import dataclasses
import functools
import json
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DEFAULT_WAVE, DEPTH, EPSILON, GEO_SPP
from .rays import RayBundle, make_rays, project_to, propagate_to
from .surfaces import SurfaceMeta, SurfaceParams, make_surface, ray_reaction, sag_r2


# ==========================================================================
# Jitted trace kernels
# ==========================================================================
@functools.partial(
    jax.jit,
    static_argnames=("metas", "wvln", "forward", "coherent", "lens_range", "record"),
)
def _trace_impl(ray: RayBundle, params: Tuple[SurfaceParams, ...], metas, wvln,
                forward, coherent, lens_range, record):
    oss = [ray.o] if record else None
    order = lens_range if forward else tuple(reversed(lens_range))
    for i in order:
        ray = ray_reaction(ray, params[i], metas[i], wvln, forward, coherent)
        if record:
            oss.append(ray.o)
    if record:
        return ray, jnp.stack(oss, axis=0)
    return ray, None


def _trim_mean(x: np.ndarray, proportion: float = 0.1) -> float:
    """scipy.stats.trim_mean semantics (reference optics.py:1395-1396)."""
    n = len(x)
    cut = int(n * proportion)
    xs = np.sort(x)
    return float(np.mean(xs[cut : n - cut]))


class Lens:
    """A compound lens + sensor (functional core, thin stateful shell)."""

    def __init__(self, filename: Optional[str] = None, sensor_res=(1024, 1024),
                 seed: int = 0):
        self.sensor_res = tuple(sensor_res)
        self.params: Tuple[SurfaceParams, ...] = ()
        self.metas: Tuple[SurfaceMeta, ...] = ()
        self.r_last = None
        self.d_sensor = None
        self.lens_name = filename
        self._key = jax.random.PRNGKey(seed)
        self._focus_cache = {}

        if filename is not None:
            self.load_file(filename, sensor_res)

    # ------------------------------------------------------------------
    # IO  (reference optics.py:117-141, 2017-2070)
    # ------------------------------------------------------------------
    def load_file(self, filename: str, sensor_res):
        if not filename.endswith(".json"):
            raise ValueError("Only .json lens files are supported.")
        self.read_lens_json(filename)
        self.find_aperture()
        self.prepare_sensor(sensor_res)
        self.post_computation()

    def read_lens_json(self, filename: str):
        with open(filename) as f:
            data = json.load(f)
        params, metas = [], []
        for sd in data["surfaces"]:
            kind = {"Stop": "stop", "Spheric": "spheric", "Aspheric": "aspheric"}[
                sd["type"]
            ]
            p, m = make_surface(
                kind,
                r=sd["r"],
                d=sd["d"],
                c=sd.get("c", 0.0),
                k=sd.get("k", 0.0),
                ai=sd.get("ai"),
                mat1=sd["mat1"],
                mat2=sd["mat2"],
            )
            params.append(p)
            metas.append(m)
        self.params = tuple(params)
        self.metas = tuple(metas)
        self.r_last = float(data["r_last"])
        self.d_sensor = float(data["d_sensor"])

    def write_lens_json(self, filename: str):
        data = {
            "foclen": float(self.foclen),
            "fnum": float(self.fnum),
            "r_last": float(self.r_last),
            "d_sensor": float(self.d_sensor),
            "sensor_size": [float(s) for s in self.sensor_size],
            "surfaces": [],
        }
        for i, (p, m) in enumerate(zip(self.params, self.metas)):
            sd = {"r": m.r, "c": float(p.c), "d": float(p.d),
                  "mat1": m.mat1.name, "mat2": m.mat2.name}
            if m.kind == "stop":
                sd["type"] = "Stop"
            elif m.kind == "spheric":
                sd["type"] = "Spheric"
                sd["roc"] = 1 / float(p.c)
            else:
                sd["type"] = "Aspheric"
                sd["roc"] = 1 / float(p.c)
                sd["k"] = float(p.k)
                sd["ai"] = [float(a) for a in np.asarray(p.ai)[: m.ai_degree]]
            if i < len(self.params) - 1:
                sd["d_next"] = float(self.params[i + 1].d) - float(p.d)
            else:
                sd["d_next"] = float(self.d_sensor) - float(p.d)
            data["surfaces"].append(sd)
        with open(filename, "w") as f:
            json.dump(data, f, indent=4)

    # ------------------------------------------------------------------
    # Sensor / aperture bookkeeping  (reference optics.py:153-207)
    # ------------------------------------------------------------------
    def prepare_sensor(self, sensor_res=(512, 512), sensor_size=None):
        sensor_res = (
            (sensor_res, sensor_res) if isinstance(sensor_res, int) else tuple(sensor_res)
        )
        self.sensor_res = sensor_res
        H, W = sensor_res
        if sensor_size is None:
            self.sensor_size = [
                2 * self.r_last * H / math.sqrt(H**2 + W**2),
                2 * self.r_last * W / math.sqrt(H**2 + W**2),
            ]
        else:
            self.sensor_size = list(sensor_size)
            self.r_last = math.sqrt(sensor_size[0] ** 2 + sensor_size[1] ** 2) / 2
        assert abs(self.sensor_size[0] / self.sensor_size[1] - H / W) < 1e-9, (
            "Pixel is not square."
        )
        self.pixel_size = self.sensor_size[0] / sensor_res[0]

    def post_computation(self):
        self.find_aperture()
        self.hfov = self.calc_fov()
        self.foclen = self.calc_efl()
        avg_pupilz, avg_pupilx = self.entrance_pupil()
        self.fnum = self.foclen / avg_pupilx / 2

    def find_aperture(self):
        self.aper_idx = None
        for i in range(len(self.metas) - 1):
            if self.metas[i].mat1.n < 1.0003 and self.metas[i].mat2.n < 1.0003:
                self.aper_idx = i
                return

    def find_diff_surf(self):
        if self.aper_idx is None:
            return list(range(len(self.metas)))
        return list(range(0, self.aper_idx)) + list(
            range(self.aper_idx + 1, len(self.metas))
        )

    # ------------------------------------------------------------------
    # RNG helper
    # ------------------------------------------------------------------
    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------
    # Ray sampling  (reference optics.py:210-591)
    # ------------------------------------------------------------------
    def surface_sample(self, surf_idx: int = 0, n: int = 1000, key=None):
        """Uniform points on a surface's flat disc (reference surfaces.py:188-199)."""
        key = self.next_key() if key is None else key
        k1, k2 = jax.random.split(key)
        r_max = self.metas[surf_idx].r
        theta = jax.random.uniform(k1, (n,)) * 2 * np.pi
        r = jnp.sqrt(jax.random.uniform(k2, (n,)) * r_max**2)
        x = r * jnp.cos(theta)
        y = r * jnp.sin(theta)
        z = jnp.full_like(x, float(self.params[surf_idx].d))
        return jnp.stack([x, y, z], axis=1)

    def sample_parallel_2D(self, R=None, wvln=DEFAULT_WAVE, z=None, view=0.0,
                           M=15, forward=True, entrance_pupil=False):
        """2D parallel ray fan (reference optics.py:214-271)."""
        if entrance_pupil:
            pupilz, pupilx = self.entrance_pupil()
            x2 = np.linspace(-pupilx, pupilx, M, dtype=np.float32) * 0.99
            o2 = np.stack(
                [x2, np.zeros_like(x2), np.full_like(x2, pupilz)], axis=-1
            )
            d = np.stack(
                [
                    np.full_like(x2, np.sin(view / 57.3)),
                    np.zeros_like(x2),
                    np.full_like(x2, np.cos(view / 57.3)),
                ],
                axis=-1,
            )
            if pupilz > 0:
                o = o2 - d * ((o2[:, 2] + 0.1) / d[:, 2])[:, None]
            else:
                o = o2
            return make_rays(o, d)

        x = np.linspace(-R, R, M, dtype=np.float32)
        if z is None:
            z = 0.0 if forward else self.d_sensor
        o = np.stack([x, np.zeros_like(x), np.full_like(x, z)], axis=-1)
        dz = np.cos(view / 57.3) if forward else -np.cos(view / 57.3)
        d = np.stack(
            [np.full_like(x, np.sin(view / 57.3)), np.zeros_like(x), np.full_like(x, dz)],
            axis=-1,
        )
        return make_rays(o, d)

    def sample_parallel(self, fov=0.0, R=None, z=None, M=15, wvln=DEFAULT_WAVE,
                        sampling="grid", forward=True, entrance_pupil=False,
                        key=None):
        """Parallel ray grid from a plane (reference optics.py:275-359).

        Returns rays with shape [M, M] (single fov).
        """
        key = self.next_key() if key is None else key
        if z is None:
            z = float(self.params[0].d)
        fov_rad = float(np.radians(fov))

        if entrance_pupil:
            pupilz, pupilr = self.entrance_pupil()
        else:
            pupilz = 0.0
            import jax.numpy as _jnp

            sag = float(
                sag_r2(_jnp.float32(self.metas[0].r**2), self.params[0],
                       self.metas[0].ai_degree)
            )
            pupilr = R if R is not None else (
                math.tan(fov_rad) * sag + self.metas[0].r
            )
        if sampling == "grid":
            x, y = jnp.meshgrid(
                jnp.linspace(-pupilr, pupilr, M),
                jnp.linspace(pupilr, -pupilr, M),
                indexing="xy",
            )
        elif sampling == "radial":
            k1, k2 = jax.random.split(key)
            r2 = jax.random.uniform(k1, (M, M)) * pupilr**2
            theta = jax.random.uniform(k2, (M, M)) * 2 * np.pi
            x = jnp.sqrt(r2) * jnp.cos(theta)
            y = jnp.sqrt(r2) * jnp.sin(theta)
        else:
            raise ValueError("Sampling method not implemented!")

        o = jnp.stack([x, y, jnp.full_like(x, pupilz)], axis=2)
        sgn = 1.0 if forward else -1.0
        d = jnp.stack(
            [
                jnp.full_like(x, sgn * np.sin(fov_rad)),
                jnp.zeros_like(x),
                jnp.full_like(x, sgn * np.cos(fov_rad)),
            ],
            axis=2,
        )
        ray = make_rays(o, d)
        return propagate_to(ray, z)

    def sample_point_source_2D(self, depth=-1000.0, view=0.0, M=9,
                               entrance_pupil=False, wvln=DEFAULT_WAVE):
        """2D point-source fan (reference optics.py:363-396)."""
        if entrance_pupil:
            pupilz, pupilx = self.entrance_pupil()
        else:
            pupilz, pupilx = 0.0, self.metas[0].r
        x2 = np.linspace(-pupilx, pupilx, M, dtype=np.float32) * 0.99
        o2 = np.stack([x2, np.zeros_like(x2), np.full_like(x2, pupilz)], axis=1)
        o1 = np.zeros_like(o2)
        o1[:, 2] = depth
        o1[:, 0] = depth * np.tan(view / 57.3)
        ray = make_rays(o1, o2 - o1)
        return propagate_to(ray, float(self.params[0].d) - 0.1)

    def sample_point_source(self, R=None, depth=-10.0, M=11, spp=16,
                            wvln=DEFAULT_WAVE, importance_sampling=False, key=None):
        """Point-grid rays through the pupil, shape [spp, M, M] (optics.py:400-453)."""
        key = self.next_key() if key is None else key
        if R is None:
            R = self.metas[0].r
        Rw = R * self.sensor_res[1] / self.sensor_res[0]
        x, y = jnp.meshgrid(
            jnp.linspace(-1, 1, M), jnp.linspace(1, -1, M), indexing="xy"
        )
        if importance_sampling:
            x = jnp.sqrt(jnp.abs(x)) * jnp.sign(x)
            y = jnp.sqrt(jnp.abs(y)) * jnp.sign(y)
        x = x * Rw
        y = y * R
        o = jnp.stack([x, y, jnp.full_like(x, depth)], axis=-1)
        o = jnp.broadcast_to(o[None], (spp, M, M, 3))
        o2 = self.sample_pupil(res=(M, M), spp=spp, key=key)
        d = o2 - o
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return make_rays(o, d, normalize=False)

    def sample_from_points(self, o=((0.0, 0.0, -10000.0),), spp=256,
                           wvln=DEFAULT_WAVE, shrink_pupil=False, key=None):
        """Rays from point sources through the entrance pupil, [spp, N]
        (reference optics.py:457-491)."""
        key = self.next_key() if key is None else key
        o = jnp.asarray(o, jnp.float32)
        o = jnp.broadcast_to(o[None], (spp,) + o.shape)
        pupilz, pupilr = self.entrance_pupil(shrink_pupil=shrink_pupil)
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (spp,)) * 2 * np.pi
        r = jnp.sqrt(jax.random.uniform(k2, (spp,)) * pupilr**2)
        o2 = jnp.stack(
            [r * jnp.cos(theta), r * jnp.sin(theta), jnp.full_like(theta, pupilz)],
            axis=1,
        )
        d = o2[:, None, :] - o
        return make_rays(o, d)

    def sample_pupil(self, res=(512, 512), spp=16, num_angle=8, pupilr=None,
                     pupilz=None, key=None):
        """Stratified ring samples on the pupil plane (optics.py:539-591)."""
        key = self.next_key() if key is None else key
        H, W = res
        if pupilr is None or pupilz is None:
            pupilz, pupilr = self.entrance_pupil()

        if spp % num_angle != 0 or spp >= 10000:
            k1, k2 = jax.random.split(key)
            theta = jax.random.uniform(k1, (spp, H, W)) * 2 * np.pi
            r = jnp.sqrt(jax.random.uniform(k2, (spp, H, W)) * pupilr**2)
        else:
            num_r2 = spp // num_angle
            k1, k2 = jax.random.split(key)
            dtheta = jax.random.uniform(k1, (num_angle, num_r2, H, W)) * 2 * np.pi / num_angle
            dr2 = jax.random.uniform(k2, (num_angle, num_r2, H, W)) * pupilr**2 / num_r2
            i = jnp.arange(num_angle, dtype=jnp.float32)[:, None, None, None]
            j = jnp.arange(num_r2, dtype=jnp.float32)[None, :, None, None]
            theta = (dtheta + i * 2 * np.pi / num_angle).reshape(spp, H, W)
            r = jnp.sqrt((dr2 + j * pupilr**2 / num_r2).reshape(spp, H, W))
        x = r * jnp.cos(theta)
        y = r * jnp.sin(theta)
        z = jnp.full_like(x, pupilz)
        return jnp.stack([x, y, z], axis=-1)

    def sample_sensor(self, spp=64, wvln=DEFAULT_WAVE, key=None):
        """Rays from sensor pixels through the exit pupil (optics.py:494-535)."""
        key = self.next_key() if key is None else key
        H, W = self.sensor_res
        x1, y1 = jnp.meshgrid(
            jnp.linspace(-self.sensor_size[1] / 2, self.sensor_size[1] / 2, W + 1)[1:],
            jnp.linspace(self.sensor_size[0] / 2, -self.sensor_size[0] / 2, H + 1)[1:],
            indexing="xy",
        )
        z1 = jnp.full_like(x1, self.d_sensor)
        pupilz, pupilr = self.exit_pupil()
        o2 = self.sample_pupil((H, W), spp, pupilr=pupilr, pupilz=pupilz, key=key)
        o = jnp.stack([x1, y1, z1], axis=2)
        o = jnp.broadcast_to(o[None], o2.shape)
        return make_rays(o, o2 - o)

    # ------------------------------------------------------------------
    # Ray tracing  (reference optics.py:595-714)
    # ------------------------------------------------------------------
    def trace(self, ray: RayBundle, lens_range=None, record=False, forward=None,
              wvln=DEFAULT_WAVE, coherent=False):
        if lens_range is None:
            lens_range = tuple(range(len(self.metas)))
        else:
            lens_range = tuple(lens_range)
        if forward is None:
            forward = bool(np.asarray(ray.d).reshape(-1, 3)[0, 2] > 0)
        out, oss = _trace_impl(
            ray, self.params, self.metas, float(wvln), forward, coherent,
            lens_range, record,
        )
        valid = out.ra > 0
        return out, valid, oss

    def trace2sensor(self, ray: RayBundle, record=False, wvln=DEFAULT_WAVE,
                     coherent=False):
        ray, valid, oss = self.trace(ray, record=record, wvln=wvln, coherent=coherent)
        ray = propagate_to(ray, self.d_sensor, coherent=coherent, wvln=wvln)
        if record:
            oss = jnp.concatenate([oss, ray.o[None]], axis=0)
            return ray, oss
        return ray

    def trace2obj(self, ray: RayBundle, depth=DEPTH, wvln=DEFAULT_WAVE):
        ray, _, _ = self.trace(ray, wvln=wvln)
        return propagate_to(ray, depth)

    # ------------------------------------------------------------------
    # Focus  (reference optics.py:1079-1180)
    # ------------------------------------------------------------------
    def calc_foclen(self):
        if self.r_last < 8:
            return self.calc_efl()
        return self.calc_bfl()

    def calc_bfl(self, wvln=DEFAULT_WAVE):
        return self.d_sensor - self.calc_principal(wvln=wvln)[1]

    def calc_efl(self):
        return self.r_last / math.tan(self.hfov)

    def calc_eqfl(self):
        return 21.63 / math.tan(self.hfov)

    def calc_foc_dist(self, wvln=DEFAULT_WAVE, key=None):
        """Object-space focus distance, traced sensor -> object (optics.py:1112-1131)."""
        o1 = jnp.tile(jnp.asarray([0.0, 0.0, self.d_sensor], jnp.float32), (GEO_SPP, 1))
        o2 = self.surface_sample(0, GEO_SPP, key=key) * 0.2
        ray = make_rays(o1, o2 - o1)
        ray, _, _ = self.trace(ray, wvln=wvln)
        o, d, ra = np.asarray(ray.o), np.asarray(ray.d), np.asarray(ray.ra)
        t = (d[..., 0] * o[..., 0] + d[..., 1] * o[..., 1]) / (
            d[..., 0] ** 2 + d[..., 1] ** 2
        )
        focus_p = (o[..., 2] - d[..., 2] * t)[ra > 0]
        focus_p = focus_p[~np.isnan(focus_p) & (focus_p < 0)]
        return float(np.mean(focus_p))

    def refocus_inf(self):
        ray = self.sample_parallel_2D(R=self.metas[0].r * 0.5, M=GEO_SPP)
        self._refocus_from_ray(ray, require_positive=True)

    def refocus(self, depth=DEPTH):
        """Move the sensor to focus at `depth` (reference optics.py:1155-1180).

        Results are memoised per depth: the reference re-traces 2048 rays and
        re-runs the O(M^2) pupil solve on every call (the dominant cost of its
        PSF-net training loop); here repeated focus distances are free.
        """
        cached = self._focus_cache.get(float(depth))
        if cached is not None:
            (self.d_sensor, self.hfov, self.foclen, self.fnum,
             self._pupil_cache) = cached
            return

        o = self.surface_sample(0, GEO_SPP, key=jax.random.PRNGKey(hash(float(depth)) % (2**31)))
        d = o - jnp.asarray([0.0, 0.0, depth], jnp.float32)
        ray = make_rays(o, d)
        self._refocus_from_ray(ray, require_positive=True)
        self._focus_cache[float(depth)] = (
            self.d_sensor, self.hfov, self.foclen, self.fnum, self._pupil_cache,
        )

    def _refocus_from_ray(self, ray, require_positive=True):
        ray, _, _ = self.trace(ray)
        o, d, ra = np.asarray(ray.o), np.asarray(ray.d), np.asarray(ray.ra)
        t = (d[..., 0] * o[..., 0] + d[..., 1] * o[..., 1]) / (
            d[..., 0] ** 2 + d[..., 1] ** 2
        )
        t = t * ra
        focus_d = o[..., 2] - d[..., 2] * t
        focus_d = focus_d[ra > 0]
        focus_d = focus_d[~np.isnan(focus_d) & (focus_d > 0)]
        d_sensor_new = float(np.mean(focus_d))
        assert d_sensor_new > 0, "sensor position is negative."
        self.d_sensor = d_sensor_new
        self.post_computation()

    # ------------------------------------------------------------------
    # FoV / magnification  (reference optics.py:1186-1305)
    # ------------------------------------------------------------------
    def calc_fov(self):
        M = 100
        pupilz, pupilx = self.exit_pupil(shrink_pupil=True)
        o1 = np.tile(
            np.asarray([self.r_last, 0.0, self.d_sensor], np.float32), (M, 1)
        )
        x2 = np.linspace(-pupilx, pupilx, M, dtype=np.float32)
        o2 = np.stack([x2, np.zeros_like(x2), np.full_like(x2, pupilz)], axis=-1)
        ray = make_rays(o1, o2 - o1)
        ray, _, _ = self.trace(ray, forward=False)
        d, ra = np.asarray(ray.d), np.asarray(ray.ra)
        tan_fov = d[..., 0] / d[..., 2]
        fov = np.arctan(np.sum(tan_fov * ra) / np.sum(ra))
        if np.isnan(fov):
            return 0.5
        return float(fov)

    def calc_magnification3(self, depth, key=None):
        """Ray-traced magnification (reference optics.py:1221-1255)."""
        M, spp = 21, 512
        ray = self.sample_point_source(
            M=M, spp=spp, depth=depth,
            R=-depth * math.tan(self.hfov) * 0.5, key=key,
        )
        o1 = np.flip(np.asarray(ray.o)[..., :2], (1, 2))
        ray, _, _ = self.trace(ray)
        o2 = np.asarray(project_to(ray, self.d_sensor))
        ra = np.asarray(ray.ra)
        x1 = o1[0, :, :, 0]
        x2 = np.sum(o2[..., 0] * ra, axis=0) / (np.sum(ra, axis=0) + EPSILON)
        mag_x = x1 / x2
        tmp = mag_x[: M // 2, : M // 2]
        mag = 1 / float(np.mean(tmp[~np.isnan(tmp)]))
        if mag == 0:
            return 1 / self.calc_scale_pinhole(depth)
        return mag

    def calc_principal(self, wvln=DEFAULT_WAVE):
        """Front/back principal planes (reference optics.py:1258-1282)."""
        M = 32
        out = []
        for forward in (False, True):
            ray = self.sample_parallel_2D(R=self.metas[0].r, M=M, forward=forward,
                                          wvln=wvln)
            inc_o = np.asarray(ray.o)
            ray_out, _, _ = self.trace(ray, forward=forward, wvln=wvln)
            o, d, ra = np.asarray(ray_out.o), np.asarray(ray_out.d), np.asarray(ray_out.ra)
            t = (o[..., 0] - inc_o[..., 0]) / d[..., 0]
            z = o[..., 2] - d[..., 2] * t
            out.append(float(np.nanmean(z[ra > 0])))
        front_principal, back_principal = out
        return front_principal, back_principal

    def calc_scale_pinhole(self, depth):
        scale = -np.asarray(depth) * math.tan(self.hfov) / self.r_last
        return scale

    def calc_scale_ray(self, depth):
        if np.ndim(depth) == 1:
            return np.asarray([1 / self.calc_magnification3(float(d)) for d in depth])
        return 1 / self.calc_magnification3(float(depth))

    # ------------------------------------------------------------------
    # Pupils  (reference optics.py:1311-1403)
    # ------------------------------------------------------------------
    def exit_pupil(self, shrink_pupil=False):
        return self.entrance_pupil(entrance=False, shrink_pupil=shrink_pupil)

    def entrance_pupil(self, M=32, entrance=True, shrink_pupil=False):
        cache = getattr(self, "_pupil_cache", None)
        if cache is None:
            cache = self._pupil_cache = {}
        hit = cache.get((M, entrance))
        if hit is not None:
            z, x = hit
            return (z, x * 0.5) if shrink_pupil else (z, x)

        if self.aper_idx is None:
            if entrance:
                res = (float(self.params[0].d), self.metas[0].r)
            else:
                res = (float(self.params[-1].d), self.metas[-1].r)
        else:
            res = self._pupil_solve(M, entrance)
        cache[(M, entrance)] = res
        z, x = res
        return (z, x * 0.5) if shrink_pupil else (z, x)

    def _pupil_solve(self, M, entrance):
        """Trace edge-of-aperture rays and intersect them pairwise.

        Vectorized replacement for the reference's O(M^2) Python loop
        (optics.py:1368-1389); same statistic (10% trimmed mean).
        """
        aper_idx = self.aper_idx
        aper_z = float(self.params[aper_idx].d)
        aper_r = self.metas[aper_idx].r
        ray_o = np.tile(np.asarray([aper_r, 0.0, aper_z], np.float32), (M, 1))
        phi = np.arange(-0.5, 0.5, 1.0 / M, dtype=np.float32)
        dz = -np.cos(phi) if entrance else np.cos(phi)
        d = np.stack([np.sin(phi), np.zeros_like(phi), dz], axis=-1)
        ray = make_rays(ray_o, d)

        if entrance:
            lens_range = tuple(range(0, aper_idx))
        else:
            lens_range = tuple(range(aper_idx + 1, len(self.metas)))
        if len(lens_range) > 0:
            ray, _, _ = self.trace(ray, lens_range=lens_range, forward=not entrance)

        o = np.asarray(ray.o, np.float64)
        dd = np.asarray(ray.d, np.float64)
        ra = np.asarray(ray.ra)
        ii, jj = np.triu_indices(M, k=1)
        ok = (ra[ii] != 0) & (ra[jj] != 0)
        ii, jj = ii[ok], jj[ok]
        if len(ii) == 0:
            return 0.0, aper_r
        d1x, d1z = dd[ii, 0], dd[ii, 2]
        d2x, d2z = dd[jj, 0], dd[jj, 2]
        o1x, o1z = o[ii, 0], o[ii, 2]
        o2x, o2z = o[jj, 0], o[jj, 2]
        adet = -d1x * d2z + d2x * d1z
        b1 = -d1z * o1x + d1x * o1z
        b2 = -d2z * o2x + d2x * o2z
        oz = (-b1 * d2z + b2 * d1z) / adet
        ox = (b2 * d1x - b1 * d2x) / adet
        avg_x = _trim_mean(ox, 0.1)
        avg_z = _trim_mean(oz, 0.1)
        if abs(avg_z) < EPSILON:
            avg_z = 0.0
        return avg_z, avg_x

    # ------------------------------------------------------------------
    # Lens operations  (reference optics.py:1416-1545)
    # ------------------------------------------------------------------
    def set_aperture(self, fnum=None, foclen=None, aper_r=None):
        if aper_r is None:
            if foclen is None:
                foclen = self.calc_efl()
            aper_r = foclen / fnum / 2
        metas = list(self.metas)
        m = metas[self.aper_idx]
        metas[self.aper_idx] = dataclass_replace(m, r=float(aper_r))
        self.metas = tuple(metas)
        self._pupil_cache = {}
        self._focus_cache = {}
        self.fnum = self.foclen / aper_r / 2

    def perturb(self, ratio=0.001, thickness_precision=0.0005,
                diameter_precision=0.001, rng=None):
        """Manufacturing-error injection (reference surfaces.py:926-943)."""
        rng = np.random.default_rng() if rng is None else rng
        params, metas = list(self.params), list(self.metas)
        for i, (p, m) in enumerate(zip(params, metas)):
            metas[i] = dataclass_replace(
                m, r=m.r + float(rng.standard_normal()) * diameter_precision
            )
            c = p.c * (1 + rng.standard_normal() * ratio) if float(p.c) != 0 else p.c
            d = p.d + rng.standard_normal() * thickness_precision if float(p.d) != 0 else p.d
            k = p.k * (1 + rng.standard_normal() * ratio) if float(p.k) != 0 else p.k
            ai = p.ai * (1 + rng.standard_normal(p.ai.shape).astype(np.float32) * ratio)
            params[i] = SurfaceParams(
                c=jnp.float32(c), d=jnp.float32(d), k=jnp.float32(k),
                ai=jnp.asarray(ai, jnp.float32),
            )
        self.params, self.metas = tuple(params), tuple(metas)
        self._pupil_cache = {}
        self._focus_cache = {}

    def max_height(self, idx):
        p, m = self.params[idx], self.metas[idx]
        if m.k_gt_neg1 and float(p.c) != 0:
            return float(np.sqrt(1 / (float(p.k) + 1) / float(p.c) ** 2)) - 0.01
        return 100.0

    def prune_surf(self, outer=None):
        """Prune surface apertures to the traced ray envelope
        (reference optics.py:1444-1453 — delegates to pruning_v2)."""
        outer = self.r_last * 0.05 if outer is None else outer
        self.pruning_v2(outer=outer)

    def pruning_v2(self, outer=None, surface_range=None):
        """Prune surfaces to the minimum height passing all valid rays
        (reference optics.py:1457-1501): reset apertures to the sensor
        radius, trace a max-FoV 2D fan, clamp each aperture to the traced
        ray envelope + `outer`, enforce front<=back heights at cemented
        interfaces, and cap by the surface's own max height."""
        outer = self.r_last * 0.05 if outer is None else outer
        if surface_range is None:
            surface_range = self.find_diff_surf()

        metas = list(self.metas)
        for i in surface_range:
            metas[i] = dataclass_replace(metas[i], r=self.r_last)
        self.metas = tuple(metas)
        self._pupil_cache = {}

        view = self.hfov if self.hfov is not None else math.atan(self.r_last / self.d_sensor)
        ray = self.sample_parallel_2D(view=np.rad2deg(view), M=21, entrance_pupil=True)
        _, oss = self.trace2sensor(ray=ray, record=True)
        oss = np.asarray(oss)  # [n_surf+2, M, 3]

        metas = list(self.metas)
        for i in surface_range:
            height = np.abs(oss[i + 1, :, 0])
            metas[i] = dataclass_replace(metas[i], r=float(height.max()) + outer)
        for i in surface_range[:-1]:
            if metas[i].mat1.n < metas[i + 1].mat1.n:
                metas[i] = dataclass_replace(
                    metas[i], r=min(metas[i].r, metas[i + 1].r)
                )
        self.metas = tuple(metas)
        metas = list(self.metas)
        for i in surface_range:
            mh = min(self.max_height(i), self.r_last)
            metas[i] = dataclass_replace(metas[i], r=min(metas[i].r, mh))
        self.metas = tuple(metas)
        self._pupil_cache = {}
        self._focus_cache = {}

    def correct_shape(self):
        """Fix degenerate geometry during lens optimisation (optics.py:1504-1545)."""
        shape_changed = False
        params = list(self.params)
        move = float(params[0].d)
        for i, p in enumerate(params):
            params[i] = p._replace(d=p.d - move)
        self.d_sensor -= move

        if self.aper_idx == 0:
            d_aper = 0.1
            aper_r = self.metas[0].r
            p1 = params[1]
            sag1 = -float(sag_r2(jnp.float32(aper_r**2), p1, self.metas[1].ai_degree))
            if sag1 > 0:
                d_aper += sag1
            delta = float(params[1].d) - d_aper
            for i in self.find_diff_surf():
                params[i] = params[i]._replace(d=params[i].d - delta)

        diff = self.find_diff_surf()
        for a, b in zip(diff[:-1], diff[1:]):
            if float(params[a].d) > float(params[b].d):
                params[b] = params[b]._replace(d=params[b].d + 0.2)
                shape_changed = True
        self.params = tuple(params)
        self._pupil_cache = {}
        self._focus_cache = {}
        self.prune_surf()
        return shape_changed


def dataclass_replace(obj, **kw):
    return dataclasses.replace(obj, **kw)
