"""PSF surrogate network: training, evaluation, and focal-stack rendering.

TPU-native rewrite of `deeplens/psfnet.py`.  The reference couples the
surrogate to the lens by inheritance (`PSFNet(Lensgroup)`, psfnet.py:14); here
it is composition + delegation: `PSFNet` owns a `Lens` and Flax `MLP` params,
and every hot path (training step with on-the-fly ray-traced labels, per-pixel
render) is one fused jitted function.

Key performance differences from the reference:
* `refocus` per training iteration is memoised (20 discrete focus distances ->
  20 cache entries; reference re-traces 2048 rays + O(M^2) pupil solve each
  iteration, psfnet.py:148 -> optics.py:1155-1180).
* label generation (ray tracing) + MLP forward/backward run in a single jit on
  device — no host round-trips.
* render never materialises the unfold buffer (see ops/render.py).
"""
from __future__ import annotations

import functools
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..constants import DEFAULT_WAVE, DMAX, DMIN
from ..ops.render import local_psf_render
from ..optics.lens import Lens
from ..optics.psf import _psf_impl, lens_psf
from .arch import MLP, MLPConv
from .convert import torch_mlp_to_flax


class PSFNet:
    """Lens + implicit PSF representation (reference psfnet.py:14-481)."""

    def __init__(self, filename, model_name="mlp", kernel_size=11,
                 sensor_res=(512, 512), seed=0, render_dtype="f32"):
        self.lens = Lens(filename, sensor_res=sensor_res, seed=seed)
        self.in_features = 4
        self.kernel_size = kernel_size
        self.model_name = model_name
        # Activation storage dtype of the production (Pallas) render path.
        # On TPU the MXU matmuls run single-pass bf16 either way (XLA
        # Precision.DEFAULT lowers f32 matmuls to bf16 passes — measured rel
        # err 2.4e-3 == an explicit bf16 cast, docs/DESIGN.md §4), so 'f32'
        # (the default) is the fast path: same MXU throughput, no per-layer
        # VPU cast (1.91 vs 1.99 ms/frame measured).  'bf16' casts
        # activations/weights explicitly, halving their VMEM footprint.
        # Output error of either (~1e-3 relative) is below the surrogate's
        # own model error vs ray tracing (gated by tests/test_pallas.py).
        assert render_dtype in ("bf16", "f32")
        self.render_dtype = render_dtype
        # Whole-stack fused kernel (ops/pallas_render.fused_render_stack):
        # production default — with spatial grid dims annotated "parallel"
        # it measures 1.76 ms/frame on v5e vs 2.39 for lax.map over the
        # per-frame fused kernel (see _get_stack_jit).
        self.stack_kernel = True

        # Training settings (reference psfnet.py:26-38)
        self.spp = 4096
        self.patch_size = 64
        self.psf_grid = [sensor_res[0] // self.patch_size, sensor_res[1] // self.patch_size]
        self.d_max = -DMAX
        self.d_min = -DMIN
        self.foc_d_arr = np.array(
            [-500, -600, -700, -800, -900,
             -1000, -1250, -1500, -1750, -2000,
             -2500, -3000, -4000, -5000, -6000,
             -8000, -10000, -12000, -15000, -20000], dtype=np.float64,
        )
        self.foc_z_arr = (self.foc_d_arr - self.d_min) / (self.d_max - self.d_min)

        self._np_rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed + 17)
        self.init_net()
        self._render_jit = None

    # -- delegate lens API (refocus, entrance_pupil, trace, ...) ------------
    def __getattr__(self, name):
        lens = object.__getattribute__(self, "__dict__").get("lens")
        if lens is not None and hasattr(lens, name):
            return getattr(lens, name)
        raise AttributeError(name)

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------
    # Network init / IO  (reference psfnet.py:44-76)
    # ------------------------------------------------------------------
    def init_net(self):
        ks = self.kernel_size
        if self.model_name == "mlp":
            self.model = MLP(in_features=4, out_features=ks**2,
                             hidden_features=256, hidden_layers=8)
            dummy = jnp.zeros((1, 4), jnp.float32)
        elif self.model_name == "mlpconv":
            self.model = MLPConv(in_features=2, ks=max(ks, 128))
            dummy = jnp.zeros((1, 2), jnp.float32)
        else:
            raise ValueError("Unsupported PSF network architecture.")
        self.variables = self.model.init(self.next_key(), dummy)

    def load_net(self, net_path):
        """Load a pretrained network: torch .pkl (reference format) or .msgpack."""
        if net_path.endswith(".pkl"):
            self.variables = jax.tree.map(jnp.asarray, torch_mlp_to_flax(net_path))
        else:
            from flax.serialization import from_bytes

            with open(net_path, "rb") as f:
                self.variables = from_bytes(self.variables, f.read())
        self._render_jit = None

    def save_net(self, net_path):
        from flax.serialization import to_bytes

        # atomic (tmp + replace): long fits save every eval interval under a
        # chunk/timeout regime — a SIGTERM mid-write must not truncate the
        # only checkpoint (same policy as trainer.save_checkpoint)
        tmp = net_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(to_bytes(self.variables))
        os.replace(tmp, net_path)

    # ------------------------------------------------------------------
    # Depth normalisation  (reference psfnet.py:447-454)
    # ------------------------------------------------------------------
    def depth2z(self, depth):
        z = (depth - self.d_min) / (self.d_max - self.d_min)
        return jnp.clip(z, 0.0, 1.0)

    def z2depth(self, z):
        return z * (self.d_max - self.d_min) + self.d_min

    def _lens_scalars(self):
        pupilz, pupilr = self.lens.entrance_pupil()
        return (
            jnp.float32(self.lens.d_sensor), jnp.float32(pupilz),
            jnp.float32(pupilr), jnp.float32(self.lens.hfov),
            jnp.float32(self.lens.r_last), jnp.float32(self.lens.sensor_size[1]),
            jnp.float32(self.lens.sensor_size[0]), jnp.float32(self.lens.pixel_size),
        )

    # ------------------------------------------------------------------
    # PSF (ray-traced ground truth)
    # ------------------------------------------------------------------
    def psf(self, points, ks=None, spp=None, wvln=DEFAULT_WAVE, center=True,
            key=None):
        ks = self.kernel_size if ks is None else ks
        spp = self.spp if spp is None else spp
        return lens_psf(self.lens, points, ks=ks, wvln=wvln, spp=spp,
                        center=center, key=key)

    # ------------------------------------------------------------------
    # Training  (reference psfnet.py:79-170)
    # ------------------------------------------------------------------
    def _make_train_iter(self, bs, spp, optimizer):
        """One fit iteration (sample batch -> ray-trace GT -> MSE -> AdamW),
        as a pure function reused by the single-step and scanned paths."""
        model, lens = self.model, self.lens
        ks = self.kernel_size
        metas = lens.metas
        lens_range = tuple(range(len(metas)))
        d_min, d_max = self.d_min, self.d_max

        def iter_fn(variables, opt_state, key, foc_z, lens_params, scalars,
                    active=True):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            x = (jax.random.uniform(k1, (bs,)) - 0.5) * 2
            y = (jax.random.uniform(k2, (bs,)) - 0.5) * 2
            zg = jnp.clip(jax.random.normal(k3, (bs,)), -3, 3)
            z = jnp.where(zg > 0, (1 - foc_z) * zg / 3 + foc_z, foc_z * zg / 3 + foc_z)
            inp = jnp.stack([x, y, z, jnp.full_like(x, foc_z)], axis=-1)

            depth = z * (d_max - d_min) + d_min
            points = jnp.stack([x, y, depth], axis=-1)
            psf_gt = _psf_impl(
                lens_params, metas, points, k4, ks, spp, DEFAULT_WAVE, True,
                lens_range, *scalars,
            )
            psf_gt = psf_gt.reshape(bs, -1)
            psf_gt = jax.lax.stop_gradient(psf_gt)

            def loss_fn(v):
                pred = model.apply(v, inp)
                return jnp.mean((pred - psf_gt) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(variables)
            new_updates, new_opt_state = optimizer.update(
                grads, opt_state, variables
            )
            new_variables = optax.apply_updates(variables, new_updates)
            # In-graph non-finite guard (same policy as the DFF trainer):
            # one pathological batch must not poison the fit.  `active` also
            # routes through here: a masked-off iteration (scan tail padding)
            # leaves variables, opt_state — including the schedule count —
            # untouched.
            ok = active & jnp.isfinite(loss) & jnp.isfinite(optax.global_norm(grads))
            variables = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_variables, variables
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old)
                if hasattr(new, "shape") else new,
                new_opt_state, opt_state,
            )
            return variables, opt_state, loss

        return iter_fn

    def _build_train_step(self, bs, spp, optimizer):
        return jax.jit(self._make_train_iter(bs, spp, optimizer),
                       donate_argnums=(0, 1))

    def _build_train_scan(self, bs, spp, optimizer):
        """K fit iterations per dispatch via `lax.scan` — identical math to
        the single step, but amortises the per-dispatch link round trip
        (1-40 ms by session), which dominates small-batch fitting on the
        tunnelled TPU.  `stacked_scalars` holds the per-focus lens scalars
        stacked over the 20 training focus distances; `foc_idx` selects per
        iteration."""
        iter_fn = self._make_train_iter(bs, spp, optimizer)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scan_step(variables, opt_state, keys, foc_zs, foc_idx, active,
                      lens_params, stacked_scalars):
            def body(carry, xs):
                v, o = carry
                key, fz, idx, act = xs
                scalars = tuple(s[idx] for s in stacked_scalars)
                v, o, loss = iter_fn(v, o, key, fz, lens_params, scalars,
                                     active=act)
                return (v, o), loss

            (variables, opt_state), losses = jax.lax.scan(
                body, (variables, opt_state), (keys, foc_zs, foc_idx, active)
            )
            return variables, opt_state, losses

        return scan_step

    def train_psfnet(self, iters=10000, bs=128, lr=1e-4, spp=2048,
                     evaluate_every=1000, result_dir="./results/temp",
                     iters_per_dispatch=25):
        """Fit the surrogate with on-the-fly ray-traced labels
        (reference psfnet.py:79-132).

        model_name='mlp' runs the fully-jitted point-PSF pipeline;
        'mlpconv' trains on ray-traced PSF maps (reference psfnet.py:93-97).

        `iters_per_dispatch` iterations run as one `lax.scan` program per
        dispatch (identical math to stepping one-by-one); on the tunnelled
        TPU the per-dispatch link round trip (1-40 ms by session) otherwise
        dominates: 4.2 iters/s one-by-one vs ~20 scanned on a 28 ms link.
        """
        os.makedirs(result_dir, exist_ok=True)
        if self.model_name == "mlpconv":
            return self._train_psfnet_maps(iters, bs, lr, evaluate_every,
                                           result_dir)
        optimizer = optax.adamw(
            optax.cosine_decay_schedule(lr, decay_steps=int(iters), alpha=0.0)
        )
        opt_state = optimizer.init(self.variables)
        K = max(1, min(int(iters_per_dispatch), int(evaluate_every)))
        scan_step = self._build_train_scan(bs, spp, optimizer)

        # Pre-resolve the 20 focus states once (reference pays this per iter)
        # and stack them for in-graph per-iteration selection.
        per_focus = []
        for foc_z, foc_d in zip(self.foc_z_arr, self.foc_d_arr):
            self.lens.refocus(float(foc_d))
            per_focus.append(self._lens_scalars())
        stacked_scalars = tuple(
            jnp.stack([s[j] for s in per_focus]) for j in range(len(per_focus[0]))
        )
        foc_z_arr = np.asarray(self.foc_z_arr, np.float32)

        # Keep at most `evaluate_every` live device scalars: pending loss
        # chunks are flushed to host floats at each eval interval.
        # Every dispatch runs the same K-length scan program (partial tails
        # are padded with masked-off iterations — no update, no schedule
        # tick — so only ONE program ever compiles).
        losses, pending = [], []
        done = 0
        total = int(iters) + 1
        while done < total:
            k = min(K, total - done,
                    evaluate_every - (done % evaluate_every) or evaluate_every)
            idx = np.zeros(K, np.int64)
            idx[:k] = self._np_rng.integers(0, len(foc_z_arr), size=k)
            active = np.arange(K) < k
            keys = jax.random.split(self.next_key(), K)
            self.variables, opt_state, loss_chunk = scan_step(
                self.variables, opt_state, keys,
                jnp.asarray(foc_z_arr[idx]), jnp.asarray(idx),
                jnp.asarray(active), self.lens.params, stacked_scalars,
            )
            pending.append((loss_chunk, k))
            done += k
            if done % evaluate_every == 0 or done >= total:
                for chunk, nk in pending:
                    losses.extend(float(l) for l in np.asarray(chunk)[:nk])
                pending.clear()
                logging.info(f"iter {done}: loss {losses[-1]:.3e}")
                self.save_net(f"{result_dir}/PSFNet_{self.model_name}.msgpack")
        return losses

    def _train_psfnet_maps(self, iters, bs, lr, evaluate_every, result_dir):
        """MLPConv training on ray-traced PSF maps (reference psfnet.py:93-97,
        173-212).  Data generation stays host-driven (each map is a fresh
        refocus + grid trace); the update step is jitted."""
        ks_map = self.model.ks
        optimizer = optax.adamw(
            optax.cosine_decay_schedule(lr, decay_steps=int(iters), alpha=0.0)
        )
        opt_state = optimizer.init(self.variables)
        model = self.model

        @jax.jit
        def step(variables, opt_state, inp, maps):
            def loss_fn(v):
                pred = model.apply(v, inp)  # [B, ks, ks, 1]
                tgt = jnp.transpose(maps, (0, 2, 3, 1))
                return jnp.mean((pred - tgt) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(variables)
            updates, opt_state = optimizer.update(grads, opt_state, variables)
            return optax.apply_updates(variables, updates), opt_state, loss

        losses = []
        for i in range(int(iters) + 1):
            inp, maps = self.get_training_psf_map(
                bs=bs, psf_map_size=(ks_map, ks_map), key=self.next_key()
            )
            self.variables, opt_state, loss = step(
                self.variables, opt_state, inp, maps
            )
            losses.append(loss)
            if (i + 1) % evaluate_every == 0:
                logging.info(f"iter {i + 1}: loss {float(loss):.3e}")
                self.save_net(f"{result_dir}/PSFNet_{self.model_name}.msgpack")
        self.save_net(f"{result_dir}/PSFNet_{self.model_name}.msgpack")
        return [float(l) for l in losses]

    def get_training_data(self, bs=256, spp=4096, key=None):
        """One batch of (input, ray-traced PSF) pairs (reference psfnet.py:135-170)."""
        key = self.next_key() if key is None else key
        foc_z = float(self._np_rng.choice(self.foc_z_arr))
        foc_dist = foc_z * (self.d_max - self.d_min) + self.d_min
        self.lens.refocus(foc_dist)

        k1, k2, k3, k4 = jax.random.split(key, 4)
        x = (jax.random.uniform(k1, (bs,)) - 0.5) * 2
        y = (jax.random.uniform(k2, (bs,)) - 0.5) * 2
        zg = jnp.clip(jax.random.normal(k3, (bs,)), -3, 3)
        z = jnp.where(zg > 0, (1 - foc_z) * zg / 3 + foc_z, foc_z * zg / 3 + foc_z)
        inp = jnp.stack([x, y, z, jnp.full_like(x, foc_z)], axis=-1)
        depth = self.z2depth(z)
        points = jnp.stack([x, y, depth], axis=-1)
        psf = self.psf(points=points, ks=self.kernel_size, spp=spp, key=k4)
        return inp, psf.reshape(bs, -1)

    def calc_psf_map(self, foc_dist, depth, psf_grid=(11, 11), key=None):
        """Ray-traced PSF grid tiled into a map [1, gh*ks, gw*ks]
        (reference psfnet.py:215-242)."""
        from ..optics.psf import make_grid_psf

        ks = self.kernel_size
        self.lens.refocus(float(foc_dist))
        gh, gw = psf_grid
        x, y = np.meshgrid(
            np.linspace(-1 + 1 / (2 * gw), 1 - 1 / (2 * gw), gw),
            np.linspace(1 - 1 / (2 * gh), -1 + 1 / (2 * gh), gh),
            indexing="xy",
        )
        x, y = x.reshape(-1), y.reshape(-1)
        pts = jnp.asarray(
            np.stack([x, y, np.full_like(x, depth)], axis=-1), jnp.float32
        )
        psf = self.psf(points=pts, ks=ks, spp=self.spp, key=key)
        return make_grid_psf(psf[:, None], nrow=gw)

    def get_training_psf_map(self, bs=8, psf_grid=(11, 11),
                             psf_map_size=(128, 128), key=None):
        """(inp [B, 2], psf maps [B, 1, size, size]) batches for the MLPConv
        architecture (reference psfnet.py:173-212)."""
        import jax.image

        foc_z = float(self._np_rng.choice(self.foc_z_arr))
        foc_dist = foc_z * (self.d_max - self.d_min) + self.d_min
        zg = np.clip(self._np_rng.standard_normal(bs), -3, 3)
        z = np.where(zg > 0, (1 - foc_z) * zg / 3 + foc_z, foc_z * zg / 3 + foc_z)
        depth = z * (self.d_max - self.d_min) + self.d_min
        inp = jnp.asarray(
            np.stack([z, np.full_like(z, foc_z)], axis=-1), jnp.float32
        )
        maps = [self.calc_psf_map(foc_dist, float(d), psf_grid, key=key)
                for d in depth]
        maps = jnp.stack(maps, axis=0)  # [B, 1, gh*ks, gw*ks]
        maps = jax.image.resize(
            maps, (bs, maps.shape[1], *psf_map_size), method="bilinear"
        )
        return inp, maps

    # ------------------------------------------------------------------
    # Evaluation  (reference psfnet.py:248-369)
    # ------------------------------------------------------------------
    def evaluate_psf_score(self, spp=None, n_z=40, foc_subset=None):
        """Mean L1/L2 PSF error over the (foc, z, field-grid) lattice
        (reference psfnet.py:305-369).  Returns (avg_l1, avg_l2).

        The whole lattice — up to 20 foc x 40 z combos, each ray-tracing the
        80-point field grid and evaluating the surrogate — runs as ONE
        `lax.scan` program: the r2 version dispatched each combo separately
        (~1,600 link round trips = ~50 s of pure latency per gate run on a
        30 ms link).  Focus states are pre-resolved on host and selected
        in-graph, the fit loop's pattern."""
        spp = self.spp if spp is None else spp
        ks = self.kernel_size
        gh, gw = self.psf_grid
        x, y = np.meshgrid(
            np.linspace(-1 + 1 / (2 * gw), 1 - 1 / (2 * gw), gw),
            np.linspace(1 - 1 / (2 * gh), -1 + 1 / (2 * gh), gh),
            indexing="xy",
        )
        xj = jnp.asarray(x.reshape(-1), jnp.float32)
        yj = jnp.asarray(y.reshape(-1), jnp.float32)
        foc_idx = (np.arange(len(self.foc_z_arr)) if foc_subset is None
                   else np.asarray(foc_subset))
        test_z = np.linspace(0, 1, n_z, endpoint=True)

        # Pre-resolve each tested focus state once; stack for in-graph select.
        per_focus = []
        for i in foc_idx:
            self.lens.refocus(float(self.foc_d_arr[i]))
            per_focus.append(self._lens_scalars())
        stacked = tuple(
            jnp.stack([s[j] for s in per_focus]) for j in range(len(per_focus[0]))
        )

        # lattice, foc-major like the reference loops
        fi = np.repeat(np.arange(len(foc_idx)), n_z)
        zs = np.tile(test_z, len(foc_idx)).astype(np.float32)
        foc_zs = np.asarray(self.foc_z_arr, np.float32)[foc_idx][
            np.repeat(np.arange(len(foc_idx)), n_z)
        ]
        keys = jax.random.split(self.next_key(), len(fi))

        model, lens = self.model, self.lens
        metas = lens.metas
        lens_range = tuple(range(len(metas)))
        d_min, d_max = self.d_min, self.d_max

        @jax.jit
        def score(variables, lens_params, stacked_scalars, keys, fi, zs, foc_zs):
            def step(carry, xs):
                key, i, z, foc_z = xs
                scalars = tuple(s[i] for s in stacked_scalars)
                depth = z * (d_max - d_min) + d_min
                pts = jnp.stack([xj, yj, jnp.full_like(xj, depth)], axis=-1)
                psf_gt = _psf_impl(
                    lens_params, metas, pts, key, ks, spp, DEFAULT_WAVE, True,
                    lens_range, *scalars,
                )
                inp = jnp.stack(
                    [xj, yj, jnp.full_like(xj, z), jnp.full_like(xj, foc_z)],
                    axis=-1,
                )
                pred = model.apply(variables, inp).reshape(-1, ks, ks)
                n = psf_gt.size
                l1 = jnp.sum(jnp.abs(psf_gt - pred)) / n
                l2 = jnp.sum((psf_gt - pred) ** 2) / n
                return carry, (l1, l2)

            _, (l1s, l2s) = jax.lax.scan(step, None, (keys, fi, zs, foc_zs))
            return jnp.mean(l1s), jnp.mean(l2s)

        l1, l2 = score(self.variables, lens.params, stacked, keys,
                       jnp.asarray(fi), jnp.asarray(zs), jnp.asarray(foc_zs))
        return float(l1), float(l2)

    def thin_lens_psf(self, depth, foc_dist, thinlens=None):
        """Thin-lens Gaussian-CoC PSF [ks, ks] (reference psfnet.py:268-301):
        un-clipped Gaussian of the CoC radius, masked to the CoC disc, L1
        normalised.  Shift-invariant — one kernel per (depth, foc_dist)."""
        ks = self.kernel_size
        if thinlens is None:
            thinlens = ThinLens(self.lens.foclen, self.lens.fnum, ks,
                                self.lens.sensor_size, self.lens.sensor_res)
        xg, yg = jnp.meshgrid(
            jnp.linspace(-ks / 2 + 0.5, ks / 2 - 0.5, ks),
            jnp.linspace(-ks / 2 + 0.5, ks / 2 - 0.5, ks),
            indexing="xy",
        )
        radius = thinlens.coc(depth, foc_dist) / 2
        r2 = xg**2 + yg**2
        psf = jnp.exp(-r2 / (2 * radius**2)) * (r2 < radius**2)
        return psf / jnp.maximum(psf.sum(), 1e-12)

    def evaluate_psf(self, result_dir="./"):
        """Qualitative GT / prediction / thin-lens comparison
        (reference psfnet.py:248-302).  Saves 3-row PNG panels; lens focuses
        at 1.5 m, PSFs evaluated at 1.2 / 1.5 / 2 m and 3 field points."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ks = self.kernel_size
        x = jnp.asarray([0.0, 0.6, 0.98])
        y = jnp.asarray([0.0, 0.6, 0.98])
        test_foc_dists = [-1500.0]
        test_dists = [-1200.0, -1500.0, -2000.0]
        thinlens = ThinLens(self.lens.foclen, self.lens.fnum, ks,
                            self.lens.sensor_size, self.lens.sensor_res)
        for foc_dist in test_foc_dists:
            foc_z = float(np.clip((foc_dist - self.d_min) / (self.d_max - self.d_min), 0, 1))
            self.lens.refocus(foc_dist)
            for depth in test_dists:
                z = float(np.clip((depth - self.d_min) / (self.d_max - self.d_min), 0, 1))
                pts = jnp.stack([x, y, jnp.full_like(x, depth)], axis=-1)
                psf_gt = self.psf(points=pts, ks=ks)
                inp = jnp.stack(
                    [x, y, jnp.full_like(x, z), jnp.full_like(x, foc_z)], axis=-1
                )
                psf_pred = self.model.apply(self.variables, inp).reshape(-1, ks, ks)
                psf_thin = self.thin_lens_psf(depth, foc_dist, thinlens)

                fig, axs = plt.subplots(3, len(x), figsize=(3 * len(x), 9))
                for i in range(len(x)):
                    axs[0, i].imshow(np.asarray(psf_gt[i]), vmin=0, vmax=0.1)
                    axs[0, i].set_title("GT")
                    axs[1, i].imshow(np.asarray(psf_pred[i]), vmin=0, vmax=0.1)
                    axs[1, i].set_title("pred")
                    axs[2, i].imshow(np.asarray(psf_thin), vmin=0, vmax=0.1)
                    axs[2, i].set_title("thin lens")
                fig.savefig(
                    f"{result_dir}/foc{-foc_dist:.0f}_depth{-depth:.0f}.png", dpi=150
                )
                plt.close(fig)

    # ------------------------------------------------------------------
    # Inference / rendering  (reference psfnet.py:375-441)
    # ------------------------------------------------------------------
    def pred(self, inp):
        """[..., 4] -> [..., ks, ks] PSFs."""
        psf = self.model.apply(self.variables, inp)
        return psf.reshape(*psf.shape[:-1], self.kernel_size, self.kernel_size)

    def _get_render_jit(self, use_pallas: bool):
        key = (f"pallas_{self.render_dtype}" if use_pallas else "xla")
        if self._render_jit is None:
            self._render_jit = {}
        if key not in self._render_jit:
            model, ks = self.model, self.kernel_size
            d_min, d_max = self.d_min, self.d_max
            compute_dtype = (jnp.bfloat16 if self.render_dtype == "bf16"
                             else jnp.float32)
            H_res, W_res = self.lens.sensor_res
            # The fully-fused MLP+conv kernel (ops/pallas_render.py) needs
            # tile-aligned extents; ~1.9x the two-stage path on TPU
            # (4.36 vs 8.3 ms/frame at 480x640, docs/DESIGN.md §4).  Tile
            # height: largest of 32/16/8 dividing H (the r3 sweep measured
            # monotone gains up to 32 — fewer grid steps amortise the
            # per-step fixed VPU work).
            from ..ops.pallas_render import fused_tile_height

            _th = fused_tile_height(H_res, W_res)
            fused_ok = _th is not None
            # interpret mode makes the kernels runnable on the CPU test
            # mesh; on TPU they compile via Mosaic as usual
            interpret = jax.default_backend() == "cpu"

            @jax.jit
            def render_impl(variables, img, depth, foc_dist):
                N, C, H, W = img.shape
                if use_pallas and fused_ok and (H, W) == (H_res, W_res):
                    from ..ops.pallas_render import fused_render_frame

                    return fused_render_frame(
                        variables, img, depth, foc_dist,
                        ks, d_min, d_max, interpret=interpret,
                        compute_dtype=compute_dtype, th=_th,
                    )
                z = jnp.clip((depth - d_min) / (d_max - d_min), 0.0, 1.0)
                z = z.reshape(N, H, W)
                x, y = jnp.meshgrid(
                    jnp.linspace(-1, 1, W), jnp.linspace(1, -1, H), indexing="xy"
                )
                x = jnp.broadcast_to(x[None], (N, H, W))
                y = jnp.broadcast_to(y[None], (N, H, W))
                foc_z = jnp.clip(
                    (foc_dist[:, None, None] - d_min) / (d_max - d_min), 0.0, 1.0
                )
                foc_z = jnp.broadcast_to(foc_z, (N, H, W))
                o = jnp.stack([x, y, z, foc_z], axis=-1)
                if use_pallas:
                    from ..ops.pallas_mlp import flax_mlp_weights, mlp_psf_pallas

                    psf = mlp_psf_pallas(
                        o.reshape(-1, 4), flax_mlp_weights(variables), ks * ks,
                        compute_dtype=compute_dtype,
                        interpret=interpret,
                    )
                else:
                    psf = model.apply(variables, o.reshape(-1, 4))
                psf = psf.reshape(N, H, W, ks, ks)
                return local_psf_render(img, psf, kernel_size=ks)

            self._render_jit[key] = render_impl
        return self._render_jit[key]

    def _get_stack_jit(self, use_pallas: bool):
        key = (f"stack_pallas_{self.render_dtype}" if use_pallas else "stack_xla")
        key += "_sk" if self.stack_kernel else ""
        if self._render_jit is None:
            self._render_jit = {}
        if key not in self._render_jit:
            frame = self._get_render_jit(use_pallas)
            ks, d_min, d_max = self.kernel_size, self.d_min, self.d_max
            H_res, W_res = self.lens.sensor_res
            compute_dtype = (jnp.bfloat16 if self.render_dtype == "bf16"
                             else jnp.float32)
            from ..ops.pallas_render import fused_tile_height

            _th = fused_tile_height(H_res, W_res)
            fused_ok = _th is not None
            interpret = jax.default_backend() == "cpu"

            stack_kernel = self.stack_kernel

            @jax.jit
            def stack_impl(variables, img, depth, focus_dists):
                # focus_dists: [B, S] -> [B, S, C, H, W]
                N, C, H, W = img.shape
                if (stack_kernel and use_pallas and fused_ok
                        and (H, W) == (H_res, W_res)):
                    # one kernel launch renders the whole stack: the frame
                    # index is the innermost grid dim, so each tile's image
                    # halo is DMA'd once and reused for all S frames.
                    # PRODUCTION DEFAULT: with the spatial grid dims marked
                    # "parallel" (fused_render_stack's default) this measures
                    # 1.763 ms/frame on v5e vs 2.388 for the lax.map path
                    # below and 2.392 for an all-"arbitrary" grid — Mosaic
                    # pipelines blocks across tiles while the sequential S
                    # dim still reuses each tile's halo (kernel_sweep.jsonl
                    # 'fusedstackpp', 2026-08-19). Opt out with
                    # net.stack_kernel = False.
                    from ..ops.pallas_render import fused_render_stack

                    return fused_render_stack(
                        variables, img, depth, focus_dists,
                        ks, d_min, d_max, interpret=interpret,
                        compute_dtype=compute_dtype, th=_th,
                    )

                def one(fd):
                    return frame(variables, img, depth, fd)

                stack = jax.lax.map(one, jnp.transpose(focus_dists))  # [S,B,C,H,W]
                return jnp.transpose(stack, (1, 0, 2, 3, 4))

            self._render_jit[key] = stack_impl
        return self._render_jit[key]

    def render_stack(self, img, depth, focus_dists,
                     use_pallas: Optional[bool] = None):
        """Render a whole focal stack in one jitted program.

        img: [B, C, H, W]; depth: [B, 1, H, W] mm (<0); focus_dists: [B, S]
        mm (<0) -> [B, S, C, H, W].  `lax.map` over frames keeps peak memory
        at one PSF field while avoiding per-frame dispatch.
        """
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        img = jnp.asarray(img, jnp.float32)
        depth = jnp.asarray(depth, jnp.float32)
        focus_dists = jnp.asarray(focus_dists, jnp.float32)
        return self._get_stack_jit(bool(use_pallas))(
            self.variables, img, depth, focus_dists
        )

    def render_path(self, use_pallas: Optional[bool] = None) -> str:
        """Label of the path render()/render_stack() would dispatch at the
        native sensor resolution (diagnostics — bench.py prints this)."""
        from ..ops.pallas_render import TW, fused_tile_height

        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        if not use_pallas:
            return "xla-mlp+scan(f32)"
        th = fused_tile_height(*self.lens.sensor_res)
        if th is not None:
            return f"fused-mlp+conv({self.render_dtype},tile{th}x{TW})"
        return f"pallas-mlp({self.render_dtype})+scan"

    def render(self, img, depth, foc_dist, use_pallas: Optional[bool] = None):
        """Render an aberrated+defocused image (reference psfnet.py:393-441).

        img: [N, C, H, W]; depth: [N, 1, H, W] or [N, H, W] in mm (<0);
        foc_dist: [N] in mm (<0).

        On TPU the per-pixel MLP runs as a fused Pallas kernel (hidden
        activations stay in VMEM); pass use_pallas=False for the pure-XLA
        path (used by exact-parity tests).
        """
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        img = jnp.asarray(img, jnp.float32)
        if img.ndim == 3:
            img = img[None]
        depth = jnp.asarray(depth, jnp.float32)
        foc_dist = jnp.asarray(foc_dist, jnp.float32).reshape(-1)
        return self._get_render_jit(bool(use_pallas))(
            self.variables, img, depth, foc_dist
        )


# ==========================================================================
# Thin-lens Gaussian circle-of-confusion baseline (reference psfnet.py:489-570)
# ==========================================================================
class ThinLens:
    def __init__(self, foc_len, fnum, kernel_size, sensor_size, sensor_res):
        self.d_max = DMAX
        self.d_min = DMIN
        self.kernel_size = kernel_size
        self.foc_len = foc_len
        self.fnum = fnum
        self.sensor_size = sensor_size
        self.sensor_res = sensor_res
        self.ps = self.sensor_size[0] / self.sensor_res[0]
        self._render_jit = None
        self._stack_jit = None

    def coc(self, depth, foc_dist):
        """Circle of confusion in pixels (reference psfnet.py:503-511)."""
        depth = jnp.asarray(depth, jnp.float32)
        foc_dist = jnp.asarray(foc_dist, jnp.float32)
        neg = jnp.any(depth < 0)
        depth = jnp.where(neg, -depth, depth)
        foc_dist = jnp.where(neg, -foc_dist, foc_dist)
        depth = jnp.clip(depth, self.d_min, self.d_max)
        coc = (
            self.foc_len / self.fnum
            * jnp.abs(depth - foc_dist) / depth
            * self.foc_len / (foc_dist - self.foc_len)
        )
        return jnp.clip(coc / self.ps, min=0.1)

    def render(self, img, depth, foc_dist):
        """Gaussian-CoC defocus rendering (reference psfnet.py:514-570).

        img: [N, C, H, W]; depth: [N, 1, H, W]; foc_dist: [N]
        """
        img = jnp.asarray(img, jnp.float32)
        if img.ndim == 3:
            img = img[None]
        depth = jnp.asarray(depth, jnp.float32)
        foc_dist = jnp.asarray(foc_dist, jnp.float32).reshape(-1)
        if self._render_jit is None:
            ks = self.kernel_size

            @jax.jit
            def render_impl(img, depth, foc_dist):
                N, C, H, W = img.shape
                fd = jnp.broadcast_to(foc_dist[:, None, None, None], (N, 1, H, W))
                x, y = jnp.meshgrid(
                    jnp.linspace(-ks / 2 + 0.5, ks / 2 - 0.5, ks),
                    jnp.linspace(ks / 2 - 0.5, -ks / 2 + 0.5, ks),
                    indexing="xy",
                )
                coc_pix = self.coc(depth, fd)  # [N,1,H,W]
                radius = (coc_pix[:, 0, :, :, None, None]) / 2  # [N,H,W,1,1]
                r2 = x**2 + y**2
                psf = jnp.exp(-r2 / 2 / radius**2) / (2 * np.pi * radius**2)
                psf = psf * (r2 < radius**2)
                psf = psf / jnp.sum(psf, axis=(-1, -2), keepdims=True)
                return local_psf_render(img, psf, kernel_size=ks)

            self._render_jit = render_impl
        return self._render_jit(img, depth, foc_dist)

    def render_stack(self, img, depth, focus_dists):
        """Render a whole focal stack in one jitted program (same contract as
        PSFNet.render_stack): img [B, C, H, W], depth [B, 1, H, W] mm (<0),
        focus_dists [B, S] mm (<0) -> [B, S, C, H, W].  One dispatch per
        stack instead of S — the per-frame loop is dominated by link latency
        on the tunnelled TPU."""
        img = jnp.asarray(img, jnp.float32)
        depth = jnp.asarray(depth, jnp.float32)
        focus_dists = jnp.asarray(focus_dists, jnp.float32)
        if self._stack_jit is None:

            @jax.jit
            def stack_impl(img, depth, focus_dists):
                def one(fd):
                    return self.render(img, depth, fd)

                stack = jax.lax.map(one, jnp.transpose(focus_dists))
                return jnp.transpose(stack, (1, 0, 2, 3, 4))

            self._stack_jit = stack_impl
        return self._stack_jit(img, depth, focus_dists)
