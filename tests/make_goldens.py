"""Generate golden test data by running the PyTorch reference on CPU.

Run manually (goldens are committed):  python tests/make_goldens.py

The reference lives read-only at /root/reference; modules missing in this
environment (skimage, lpips, torchvision) are stubbed before import.  Goldens
are deterministic: ray inputs are built with fixed numpy values and fed to both
frameworks, so no RNG parity is required.
"""
import sys
import types

import numpy as np


def _stub_modules():
    for name in [
        "skimage", "skimage.metrics", "lpips",
        "torchvision", "torchvision.utils", "torchvision.transforms",
        "torchvision.transforms.functional", "torchvision.models",
    ]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["skimage.metrics"].peak_signal_noise_ratio = lambda *a, **k: 0
    sys.modules["skimage.metrics"].structural_similarity = lambda *a, **k: 0
    sys.modules["torchvision.utils"].save_image = lambda *a, **k: None
    sys.modules["torchvision.utils"].make_grid = lambda *a, **k: None

    class _LPIPS:  # noqa: D401
        def __init__(self, *a, **k):
            pass

    sys.modules["lpips"].LPIPS = _LPIPS


def ray_inputs(pupilz, pupilr, n_points=5, spp=64):
    """Deterministic point-source -> pupil rays, shape [spp, N, 3]."""
    rng = np.random.default_rng(1234)
    pts = np.stack(
        [
            rng.uniform(-1, 1, n_points) * 12.0,
            rng.uniform(-1, 1, n_points) * 9.0,
            -rng.uniform(500, 20000, n_points),
        ],
        axis=-1,
    ).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi, spp)
    r = np.sqrt(rng.uniform(0, 1, spp)) * pupilr * 0.98
    o2 = np.stack(
        [r * np.cos(theta), r * np.sin(theta), np.full_like(r, pupilz)], axis=-1
    ).astype(np.float32)
    o = np.broadcast_to(pts[None], (spp, n_points, 3)).copy()
    d = o2[:, None, :] - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def main():
    _stub_modules()
    sys.path.insert(0, "/root/reference")
    import torch

    from deeplens.optics import Lensgroup
    from deeplens.monte_carlo import forward_integral
    from deeplens.basics import Ray, WAVE_RGB

    torch.manual_seed(0)
    out = {}
    for lens_name in ["rf50mm", "50mm_f2.8"]:
        lens = Lensgroup(
            filename=f"/root/reference/lenses/{lens_name}/lens.json",
            sensor_res=(480, 640),
            device=torch.device("cpu"),
        )
        pz, pr = lens.entrance_pupil()
        key = lens_name.replace(".", "_")
        out[f"{key}_pupil"] = np.asarray([pz, pr])
        out[f"{key}_derived"] = np.asarray(
            [lens.foclen, lens.fnum, lens.hfov, lens.d_sensor]
        )

        o, d = ray_inputs(pz, pr)
        out[f"{key}_ray_o_in"] = o
        out[f"{key}_ray_d_in"] = d
        for wvln in WAVE_RGB:
            ray = Ray(torch.tensor(o), torch.tensor(d), wvln=wvln,
                      device=torch.device("cpu"))
            ray = lens.trace2sensor(ray)
            w = str(wvln).replace(".", "")
            out[f"{key}_w{w}_o"] = ray.o.numpy()
            out[f"{key}_w{w}_d"] = ray.d.numpy()
            out[f"{key}_w{w}_ra"] = ray.ra.numpy()
            out[f"{key}_w{w}_obliq"] = ray.obliq.numpy()

        # forward_integral golden on the traced green rays (chief-ray center)
        ray = Ray(torch.tensor(o), torch.tensor(d), wvln=0.589,
                  device=torch.device("cpu"))
        ray = lens.trace2sensor(ray)
        pointc = (ray.o[..., :2] * ray.ra.unsqueeze(-1)).sum(0) / (
            ray.ra.unsqueeze(-1).sum(0) + 1e-9
        )
        pointc = -pointc
        psf = forward_integral(ray, ps=lens.pixel_size, ks=11, pointc_ref=pointc)
        out[f"{key}_fi_pointc"] = pointc.numpy()
        out[f"{key}_fi_psf"] = psf.numpy()

        # full psf_diff golden at high spp (MC noise ~1/sqrt(spp) per cell)
        if lens_name == "rf50mm":
            lens.refocus(-2400.0)
            torch.manual_seed(7)
            pts = torch.tensor(
                [[0.0, 0.0, -2400.0], [0.6, 0.6, -5000.0], [-0.9, 0.3, -800.0]]
            )
            psf = lens.psf(points=pts, ks=11, spp=32768)
            out[f"{key}_psf_diff"] = psf.numpy()
            out[f"{key}_psf_diff_state"] = np.asarray(
                [lens.d_sensor, lens.hfov, lens.fnum]
            )

        # refocus golden: d_sensor after refocusing to a few depths
        for depth in [-500.0, -2400.0, -20000.0]:
            lens2 = Lensgroup(
                filename=f"/root/reference/lenses/{lens_name}/lens.json",
                sensor_res=(480, 640),
                device=torch.device("cpu"),
            )
            torch.manual_seed(42)
            lens2.refocus(depth)
            dkey = str(-int(depth))
            out[f"{key}_refocus_{dkey}"] = np.asarray(
                [lens2.d_sensor, lens2.hfov, lens2.fnum]
            )

    np.savez_compressed("/root/repo/tests/goldens/optics_goldens.npz", **out)
    print("wrote", len(out), "arrays")

    # ------------------------------------------------------------------
    # Render golden: PSFNet.render is deterministic given the MLP weights
    # (no RNG anywhere in psfnet.py:393-441 / render_psf.py:76-107), so the
    # full pipeline compares exactly across frameworks.
    # ------------------------------------------------------------------
    import torch
    from deeplens.psfnet import PSFNet

    rout = {}
    psfnet = PSFNet(
        filename="/root/reference/lenses/rf50mm/lens.json",
        sensor_res=(480, 640), kernel_size=11, device=torch.device("cpu"),
    )
    psfnet.psfnet.load_state_dict(
        torch.load("/root/reference/ckpt/rf50mm/PSFNet480x640_ks11.pkl",
                   map_location="cpu")
    )
    rng = np.random.default_rng(99)
    H, W = 120, 160
    img = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    depth = -rng.uniform(500, 15000, (1, 1, H, W)).astype(np.float32)
    foc = np.asarray([-2400.0], np.float32)
    with torch.no_grad():
        rendered = psfnet.render(
            torch.tensor(img), torch.tensor(depth), torch.tensor(foc)
        )
        # also golden the intermediate PSF field for a few pixels
        z = psfnet.depth2z(torch.tensor(depth)).squeeze(1)
        xg, yg = torch.meshgrid(
            torch.linspace(-1, 1, W), torch.linspace(1, -1, H), indexing="xy"
        )
        fz = psfnet.depth2z(torch.tensor(foc)[:, None, None].repeat(1, H, W))
        o = torch.stack(
            [xg[None].repeat(1, 1, 1), yg[None].repeat(1, 1, 1), z, fz], -1
        ).float()
        psf_field = psfnet.pred(o)
    rout["img"] = img
    rout["depth"] = depth
    rout["foc"] = foc
    rout["rendered"] = rendered.numpy()
    rout["psf_field_sample"] = psf_field[0, ::37, ::41].numpy()

    # ThinLens Gaussian-CoC baseline render golden (also deterministic)
    from deeplens.psfnet import ThinLens

    tl = ThinLens(50.0, 1.8, 11, [25.968, 34.624], (480, 640), device="cpu")
    with torch.no_grad():
        tl_out = tl.render(
            torch.tensor(img), torch.tensor(depth), torch.tensor(foc)
        )
    rout["thinlens_rendered"] = tl_out.numpy()
    np.savez_compressed("/root/repo/tests/goldens/render_goldens.npz", **rout)
    print("wrote render goldens")


if __name__ == "__main__":
    main()
