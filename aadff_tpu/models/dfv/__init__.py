from .dffnet import DFVNet, dfv_loss
from .feat import FeatExactor
from .submodule import DecoderBlock, DisparityRegression, SepConv3dBlock

__all__ = ["DFVNet", "dfv_loss", "FeatExactor", "DecoderBlock",
           "DisparityRegression", "SepConv3dBlock"]
