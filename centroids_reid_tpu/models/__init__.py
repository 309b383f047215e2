from .baseline import ReidModel, create_model, init_model
from .quantized import QuantizedEmbed, quantize_reid_model
from .resnet import ResNet, build_backbone, backbone_emb_size

__all__ = [
    "ReidModel",
    "create_model",
    "init_model",
    "ResNet",
    "build_backbone",
    "backbone_emb_size",
    "QuantizedEmbed",
    "quantize_reid_model",
]
