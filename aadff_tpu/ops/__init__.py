from .render import (
    local_psf_render,
    local_psf_render_high_res,
    render_psf,
    render_psf_map,
)

__all__ = [
    "local_psf_render", "local_psf_render_high_res", "render_psf",
    "render_psf_map",
]
