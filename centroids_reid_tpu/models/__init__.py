from .baseline import ReidModel, create_model, init_model
from .resnet import ResNet, build_backbone, backbone_emb_size

__all__ = [
    "ReidModel",
    "create_model",
    "init_model",
    "ResNet",
    "build_backbone",
    "backbone_emb_size",
]
