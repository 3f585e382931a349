from .arch import MLP, MLPConv, ModulateSiren, Siren
from .convert import flax_mlp_to_torch_state, torch_mlp_to_flax
from .psfnet import PSFNet, ThinLens

__all__ = ["MLP", "MLPConv", "ModulateSiren", "Siren", "PSFNet", "ThinLens",
           "torch_mlp_to_flax", "flax_mlp_to_torch_state"]
