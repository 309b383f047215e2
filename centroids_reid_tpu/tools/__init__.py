from . import coco, images
from .deepfashion import deep_fashion_to_reid
from .street2shop import street2shop_coco_to_reid, street2shop_to_coco

__all__ = [
    "coco",
    "images",
    "deep_fashion_to_reid",
    "street2shop_coco_to_reid",
    "street2shop_to_coco",
]
