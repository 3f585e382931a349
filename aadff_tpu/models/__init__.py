from .aifnet import AiFDepthNet, compute_loss
from .dfv import DFVNet, dfv_loss

__all__ = ["AiFDepthNet", "compute_loss", "DFVNet", "dfv_loss"]
