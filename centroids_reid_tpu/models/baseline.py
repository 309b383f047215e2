"""The re-id model: backbone + GAP + BNNeck + bias-free classifier.

Mirrors the behavioural surface of the reference:

* ``Baseline.forward`` returns ``(base_out, global_feat)`` where
  ``global_feat`` is the spatially averaged backbone output
  (/root/reference/modelling/baseline.py:91-96).
* The BNNeck is a BatchNorm1d over the embedding with a frozen (never
  trained) bias, followed by ``fc_query = Linear(emb, num_classes,
  bias=False)`` initialised N(0, 0.001)
  (/root/reference/modelling/bases.py:83-87).
* Validation/test embeddings are ``bn(backbone(x))``
  (/root/reference/modelling/bases.py:169-177).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .resnet import build_backbone, backbone_emb_size


class ReidModel(nn.Module):
    """Backbone + BNNeck + classifier as one pure Flax module.

    ``num_classes = 0`` builds an inference-only model (no classifier), used
    by the offline embedding CLIs.
    """

    backbone_name: str = "resnet50"
    last_stride: int = 1
    num_classes: int = 0
    s2d_stem: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = build_backbone(
            self.backbone_name, self.last_stride, dtype=self.dtype,
            s2d_stem=self.s2d_stem,
        )
        self.bn = nn.BatchNorm(
            use_running_average=None,  # passed at call time
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bnneck",
        )
        if self.num_classes > 0:
            self.fc_query = nn.Dense(
                self.num_classes,
                use_bias=False,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(stddev=0.001),
                name="fc_query",
            )

    def features(self, x, train: bool = False):
        """Global feature vector: spatial mean of the backbone output."""
        base_out = self.backbone(x, train=train)
        return jnp.mean(base_out, axis=(1, 2))

    def __call__(self, x, train: bool = False):
        """Returns (global_feat, bn_feat, logits-or-None)."""
        feat = self.features(x, train=train)
        bn_feat = self.bn(feat, use_running_average=not train)
        logits = self.fc_query(bn_feat) if self.num_classes > 0 else None
        return feat, bn_feat, logits

    def embed(self, x):
        """Eval-mode embedding, the retrieval representation: bn(GAP(trunk)).

        Always float32 output — eval math is kept in fp32
        (reference forces .float() before metrics, bases.py:280).
        """
        feat = self.features(x, train=False)
        return self.bn(feat, use_running_average=True).astype(jnp.float32)


def create_model(cfg, num_classes: int = 0) -> ReidModel:
    dtype = jnp.bfloat16 if cfg.USE_MIXED_PRECISION else jnp.float32
    emb = backbone_emb_size(cfg.MODEL.NAME)
    if emb != cfg.MODEL.BACKBONE_EMB_SIZE:
        # keep behaviour permissive like the reference (in_planes switch,
        # baseline.py:56-65) but surface the mismatch
        print(
            f"[centroids_reid_tpu] MODEL.BACKBONE_EMB_SIZE={cfg.MODEL.BACKBONE_EMB_SIZE} "
            f"!= backbone native {emb}; using {emb}"
        )
    return ReidModel(
        backbone_name=cfg.MODEL.NAME,
        last_stride=cfg.MODEL.LAST_STRIDE,
        num_classes=num_classes,
        s2d_stem=cfg.TPU.SPACE_TO_DEPTH_STEM,
        dtype=dtype,
    )


def init_model(model: ReidModel, rng, input_size, train: bool = True):
    """Initialise variables; returns (params, batch_stats)."""
    h, w = input_size
    dummy = jnp.zeros((1, h, w, 3), model.dtype)
    variables = model.init(rng, dummy, train=False)
    return variables["params"], variables["batch_stats"]
