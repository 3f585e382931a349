"""Lens analysis and visualization: layout + ray paths, PSF maps, spot
diagrams, MTF curves, distortion, RMS spot radii.

Counterpart of the reference `Lensgroup` visualization block
(`deeplens/optics.py:1548-2012`).  The ray-path "record" plumbing returns a
stacked [n_surf+2, ..., 3] array from the jitted tracer instead of per-ray
Python lists (SURVEY.md §5).
"""
from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from ..constants import DEFAULT_WAVE, DEPTH, GEO_SPP, WAVE_RGB
from .psf import lens_psf, lens_psf_map, lens_psf_rgb, psf2mtf
from .rays import project_to
from .surfaces import sag_r2


# --------------------------------------------------------------------------
# RMS spot analysis (reference optics.py:1975-2012)
# --------------------------------------------------------------------------
def analysis_rms(lens, depth=DEPTH, ref=True, key=None):
    """(avg RMS radius, on-axis RMS, off-axis RMS) over RGB wavelengths."""
    import jax.numpy as jnp

    H = 31
    scale = lens.calc_scale_ray(depth)

    p_center_ref = None
    if ref:
        ray = lens.sample_point_source(
            M=H, spp=GEO_SPP, depth=depth, R=lens.sensor_size[0] / 2 * scale,
            wvln=DEFAULT_WAVE, key=key,
        )
        ray, _, _ = lens.trace(ray)
        p_green = project_to(ray, lens.d_sensor)
        ra = ray.ra
        p_center_ref = (p_green * ra[..., None]).sum(0) / (
            ra.sum(0)[..., None] + 1e-4
        )

    rms, rms_on, rms_off = [], [], []
    for wvln in WAVE_RGB:
        ray = lens.sample_point_source(
            M=H, spp=GEO_SPP, depth=depth, R=lens.sensor_size[0] / 2 * scale,
            wvln=wvln, key=key,
        )
        ray, _, _ = lens.trace(ray, wvln=wvln)
        o2 = project_to(ray, lens.d_sensor)
        ra = ray.ra
        center = (o2 * ra[..., None]).sum(0) / (ra.sum(0)[..., None] + 1e-4)
        o2n = (o2 - (p_center_ref if ref else center)) * ra[..., None]
        rms.append(float(jnp.sqrt((o2n**2 * ra[..., None]).sum() / ra.sum())))
        c = H // 2 + 1
        rms_on.append(
            float(
                jnp.sqrt(
                    (o2n[:, c, c, :] ** 2 * ra[:, c, c, None]).sum()
                    / ra[:, H // 2, H // 2].sum()
                )
            )
        )
        rms_off.append(
            float(
                jnp.sqrt(
                    (o2n[:, 0, 0, :] ** 2 * ra[:, 0, 0, None]).sum()
                    / ra[:, 0, 0].sum()
                )
            )
        )
    n = len(rms)
    return sum(rms) / n, sum(rms_on) / n, sum(rms_off) / n


# --------------------------------------------------------------------------
# Lens layout + traced rays (reference optics.py:1575-1769)
# --------------------------------------------------------------------------
def _surface_profile(lens, idx, n=64):
    import jax.numpy as jnp

    m = lens.metas[idx]
    p = lens.params[idx]
    r = np.linspace(-m.r, m.r, n)
    if m.kind == "stop":
        z = np.full_like(r, float(p.d))
    else:
        z = np.asarray(sag_r2(jnp.asarray(r**2, jnp.float32), p, m.ai_degree)) + float(p.d)
    return z, r


def plot_setup_2d(lens, ax=None, fig=None, color="k"):
    if ax is None:
        fig, ax = plt.subplots(figsize=(8, 5))
    for i in range(len(lens.metas)):
        z, r = _surface_profile(lens, i)
        ax.plot(z, r, color, linewidth=0.8)
    # sensor plane
    ax.plot(
        [lens.d_sensor, lens.d_sensor],
        [-lens.r_last, lens.r_last], color, linewidth=1.2,
    )
    ax.set_aspect("equal")
    return ax, fig


def plot_setup2d_with_trace(lens, filename, views=None, M=7, depth=None,
                            entrance_pupil=True, lens_title=None):
    """Lens drawing with RGB ray fans (reference optics.py:1576-1633)."""
    if lens_title is None:
        lens_title = (
            f"FoV{round(2 * lens.hfov * 57.3, 1)}"
            f"_F/{round(lens.fnum, 2)}"
            f"_DIAG{round(lens.r_last * 2, 2)}mm"
            f"_FocLen{round(lens.foclen, 2)}mm"
        )
    colors = "bgr"
    views = [0, np.rad2deg(lens.hfov) * 0.707, np.rad2deg(lens.hfov) * 0.99]
    ax, fig = plot_setup_2d(lens)
    for i, view in enumerate(views):
        if depth is None:
            ray = lens.sample_parallel_2D(
                lens.metas[0].r, WAVE_RGB[2 - i], view=view, M=M,
                entrance_pupil=entrance_pupil,
            )
        else:
            ray = lens.sample_point_source_2D(
                depth=depth, view=view, M=M, entrance_pupil=entrance_pupil,
                wvln=WAVE_RGB[2 - i],
            )
        _, oss = lens.trace2sensor(ray, record=True, wvln=WAVE_RGB[2 - i])
        oss = np.asarray(oss)  # [n_surf+2, M, 3]
        for r_i in range(oss.shape[1]):
            ax.plot(oss[:, r_i, 2], oss[:, r_i, 0], colors[i], linewidth=0.5)
    ax.axis("off")
    ax.set_title(lens_title, fontsize=9)
    fig.savefig(f"{filename}.png", bbox_inches="tight", dpi=300)
    plt.close(fig)


def draw_psf_map(lens, grid=7, depth=DEPTH, ks=51, log_scale=False,
                 save_name=None, key=None):
    """RGB PSF-map figure (reference optics.py:1772-1803)."""
    psf_map = np.array(lens_psf_map(lens, depth=depth, grid=grid, ks=ks, key=key))
    for i in range(0, psf_map.shape[-2], ks):
        for j in range(0, psf_map.shape[-1], ks):
            m = psf_map[:, i : i + ks, j : j + ks].max()
            psf_map[:, i : i + ks, j : j + ks] /= max(m, 1e-12)
    if log_scale:
        psf_map = np.log(psf_map + 1e-3)
    plt.figure(figsize=(10, 10))
    plt.imshow(np.transpose(psf_map, (1, 2, 0)))
    plt.axis("off")
    name = f"./psf{-depth:.0f}mm.png" if save_name is None else f"{save_name}_psf{-depth:.0f}mm.png"
    plt.savefig(name, dpi=300, bbox_inches="tight")
    plt.close()


def draw_psf_radial(lens, M=3, depth=DEPTH, ks=51, save_name="./psf_radial.png",
                    key=None):
    """Radial (45 deg) PSFs (reference optics.py:1806-1828)."""
    import jax.numpy as jnp

    fig, axs = plt.subplots(1, M, figsize=(3 * M, 3))
    for i, t in enumerate(np.linspace(0, 1, M)):
        psf = np.asarray(
            lens_psf_rgb(lens, jnp.asarray([t, t, depth]), ks=ks, spp=4096, key=key)
        )
        psf = psf / psf.max()
        axs[i].imshow(np.transpose(psf, (1, 2, 0)))
        axs[i].axis("off")
    fig.savefig(save_name, dpi=200, bbox_inches="tight")
    plt.close(fig)


def draw_spot_diagram(lens, M=7, depth=DEPTH, wvln=DEFAULT_WAVE, save_name=None,
                      key=None):
    """Grid of spot diagrams (reference optics.py:1831-1861)."""
    mag = lens.calc_magnification3(depth)
    ray = lens.sample_point_source(
        M=M, R=lens.sensor_size[0] / 2 / mag, depth=depth, wvln=wvln, spp=1024,
        key=key,
    )
    ray = lens.trace2sensor(ray, wvln=wvln)
    o2 = -np.asarray(ray.o)
    ra = np.asarray(ray.ra)
    fig, axs = plt.subplots(M, M, figsize=(2 * M, 2 * M))
    for i in range(M):
        for j in range(M):
            sel = ra[:, i, j] > 0
            x, y = o2[sel, i, j, 0], o2[sel, i, j, 1]
            axs[i, j].scatter(x, y, 1, "black")
            if sel.sum():
                axs[i, j].scatter([x.mean()], [y.mean()], None, "r", "x")
            axs[i, j].set_aspect("equal", adjustable="datalim")
    name = save_name or "."
    fig.savefig(f"{name}_spot{-depth:.0f}mm.png", bbox_inches="tight", dpi=200)
    plt.close(fig)


def draw_spot_radial(lens, M=3, depth=DEPTH, save_name=None, key=None):
    """Radial spot diagrams along the diagonal (reference optics.py:1864-1910)."""
    mag = lens.calc_magnification3(depth)
    ray = lens.sample_point_source(
        M=M * 2 - 1, R=lens.sensor_size[0] / 2 / mag, depth=depth, spp=1024,
        key=key,
    )
    ray, _, _ = lens.trace(ray)
    from .rays import propagate_to

    ray = propagate_to(ray, lens.d_sensor)
    o2 = np.flip(np.asarray(ray.o), (1, 2))
    ra = np.flip(np.asarray(ray.ra), (1, 2))
    fig, axs = plt.subplots(1, M, figsize=(6 * M, 5))
    for i in range(M):
        ib = i + M - 1
        sel = ra[:, ib, ib] > 0
        x, y = o2[sel, ib, ib, 0], o2[sel, ib, ib, 1]
        axs[i].scatter(x, y, 12, "black")
        if sel.sum():
            axs[i].scatter([x.mean()], [y.mean()], 200, "r", "x")
        axs[i].set_aspect("equal", adjustable="datalim")
    name = save_name or "."
    fig.savefig(f"{name}_spot{-depth:.0f}mm_radial.png", bbox_inches="tight",
                dpi=150)
    plt.close(fig)


def draw_mtf(lens, relative_fov=(0.0, 0.7, 1.0), save_name="./mtf.png",
             wvlns=DEFAULT_WAVE, depth=DEPTH, key=None):
    """MTF curves via PSF FFT (reference optics.py:1913-1941)."""
    import jax.numpy as jnp

    if not save_name.endswith(".png"):
        save_name += ".png"
    relative_fov = [relative_fov] if isinstance(relative_fov, float) else relative_fov
    wvlns = [wvlns] if isinstance(wvlns, float) else wvlns
    colors = "rgb"
    plt.figure(figsize=(6, 6))
    for wvln in wvlns:
        for fi, fov in enumerate(relative_fov):
            psf = lens_psf(lens, jnp.asarray([fov, fov, depth]), ks=256,
                           wvln=wvln, key=key)
            freq, mtf_tan, mtf_sag = psf2mtf(psf, lens.pixel_size)
            fov_deg = round(fov * lens.hfov * 57.3, 1)
            plt.plot(freq, mtf_tan, colors[fi % 3], label=f"{fov_deg}(deg)-Tan")
            plt.plot(freq, mtf_sag, colors[fi % 3], label=f"{fov_deg}(deg)-Sag",
                     linestyle="--")
    plt.legend()
    plt.xlabel("Spatial Frequency [cycles/mm]")
    plt.ylabel("MTF")
    plt.savefig(save_name, bbox_inches="tight", dpi=200)
    plt.close()


def draw_distortion(lens, depth=DEPTH, save_name=None, key=None):
    """Distortion scatter (reference optics.py:1944-1972)."""
    M = 16
    scale = lens.calc_scale_pinhole(depth)
    ray = lens.sample_point_source(
        M=M, spp=GEO_SPP, depth=depth, R=lens.sensor_size[0] / 2 * scale, key=key
    )
    o1 = np.asarray(ray.o)
    x1, y1 = o1[0, :, :, 0] / scale, o1[0, :, :, 1] / scale
    ray, _, _ = lens.trace(ray)
    o2 = np.asarray(project_to(ray, lens.d_sensor))
    ra = np.asarray(ray.ra)
    x2 = (o2[..., 0] * ra).sum(0) / ra.sum(0)
    y2 = (o2[..., 1] * ra).sum(0) / ra.sum(0)
    fig, ax = plt.subplots()
    ax.set_title("Lens distortion")
    ax.scatter(x1, y1, s=2)
    ax.scatter(x2, y2, s=2)
    ax.legend(["ref", "distortion"])
    ax.axis("scaled")
    name = save_name or "."
    fig.savefig(f"{name}_distortion{-depth:.0f}mm.png", bbox_inches="tight", dpi=200)
    plt.close(fig)


def analysis(lens, save_name="./test", depth=DEPTH, key=None):
    """Full lens QA entry (reference optics.py:1551-1572)."""
    plot_setup2d_with_trace(lens, filename=save_name, depth=depth)
    draw_psf_map(lens, save_name=save_name, ks=51, key=key)
    rms_avg, rms_on, rms_off = analysis_rms(lens, key=key)
    print(
        f"On-axis RMS radius: {round(rms_on * 1000, 3)}um, "
        f"Off-axis RMS radius: {round(rms_off * 1000, 3)}um, "
        f"Avg RMS spot size (radius): {round(rms_avg * 1000, 3)}um."
    )
    return rms_avg, rms_on, rms_off
