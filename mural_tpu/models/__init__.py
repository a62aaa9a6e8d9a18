from mural_tpu.models.layers import one_hot_from_codes, max_pool1d
from mural_tpu.models.snv import FeedForwardNN, SNVNet0, SNVNet1, SNVNet2, SNVNet3
from mural_tpu.models.indel import UNetSmall
from mural_tpu.models.registry import model_choice, build_model
from mural_tpu.models.init import torch_style_init

__all__ = [
    "one_hot_from_codes", "max_pool1d",
    "FeedForwardNN", "SNVNet0", "SNVNet1", "SNVNet2", "SNVNet3",
    "UNetSmall", "model_choice", "build_model", "torch_style_init",
]
