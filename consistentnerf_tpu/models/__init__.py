"""Model layer: flax MLPs and the two NeRF backbones."""

from consistentnerf_tpu.models.mlp import MipMLP, NeRFMLP
from consistentnerf_tpu.models.nerf import VanillaNeRF
from consistentnerf_tpu.models.mipnerf import MipNeRF

__all__ = ["MipMLP", "NeRFMLP", "VanillaNeRF", "MipNeRF"]
