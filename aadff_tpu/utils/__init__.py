from .logging import Timer, set_logger, set_seed
from .image import imread_rgb, imread_depth_png, imwrite_colormap, read_pfm

__all__ = ["Timer", "set_logger", "set_seed", "imread_rgb", "imread_depth_png",
           "imwrite_colormap", "read_pfm"]
