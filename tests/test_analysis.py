"""Analysis/visualization smoke tests (headless, small sampling budgets)."""
import os

import jax
import numpy as np

from aadff_tpu.optics.analysis import (
    analysis_rms,
    draw_psf_map,
    plot_setup2d_with_trace,
)


def test_plot_setup_with_trace(rf50mm, tmp_path):
    plot_setup2d_with_trace(rf50mm, filename=str(tmp_path / "lens"))
    assert os.path.exists(tmp_path / "lens.png")


def test_draw_psf_map(rf50mm, tmp_path):
    draw_psf_map(rf50mm, grid=2, ks=11, save_name=str(tmp_path / "m"),
                 key=jax.random.PRNGKey(0))
    assert os.path.exists(tmp_path / "m_psf20000mm.png")


def test_remaining_analysis_figures(rf50mm, tmp_path):
    """MTF / distortion / spot diagrams / radial PSFs all render headless."""
    from aadff_tpu.optics.analysis import (
        draw_distortion,
        draw_mtf,
        draw_psf_radial,
        draw_spot_diagram,
        draw_spot_radial,
    )

    key = jax.random.PRNGKey(0)
    draw_mtf(rf50mm, relative_fov=(0.0,), save_name=str(tmp_path / "mtf.png"),
             key=key)
    assert os.path.exists(tmp_path / "mtf.png")
    draw_distortion(rf50mm, save_name=str(tmp_path / "d"), key=key)
    assert os.path.exists(tmp_path / "d_distortion20000mm.png")
    draw_spot_diagram(rf50mm, M=3, save_name=str(tmp_path / "s"), key=key)
    assert os.path.exists(tmp_path / "s_spot20000mm.png")
    draw_spot_radial(rf50mm, M=2, save_name=str(tmp_path / "r"), key=key)
    assert os.path.exists(tmp_path / "r_spot20000mm_radial.png")
    draw_psf_radial(rf50mm, M=2, ks=11,
                    save_name=str(tmp_path / "pr.png"), key=key)
    assert os.path.exists(tmp_path / "pr.png")


def test_analysis_rms_reasonable(rf50mm):
    """rf50mm focused at infinity: RMS spot radii should be tens of microns
    on-axis (a fast f/1.87 double-Gauss)."""
    rms_avg, rms_on, rms_off = analysis_rms(rf50mm, key=jax.random.PRNGKey(1))
    assert 0 < rms_on < 0.2, rms_on     # mm
    assert 0 < rms_avg < 0.5, rms_avg
    assert np.isfinite(rms_off)
