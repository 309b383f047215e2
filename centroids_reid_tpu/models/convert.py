"""PyTorch -> Flax weight conversion.

Converts torchvision/reference checkpoints (ImageNet backbones and full
Lightning re-id checkpoints) into this framework's parameter pytrees. The
key-surgery mirrors the reference loaders:

* ``ResNet.load_param`` strips ``backbone.``/``base.`` prefixes and skips
  fc/bottleneck/classifier/transformer keys
  (/root/reference/modelling/backbones/resnet.py:135-154).
* Full checkpoints additionally carry ``bn.*`` (BNNeck), ``fc_query.weight``
  and ``center_loss.centers`` (/root/reference/modelling/bases.py:83-87).

Layout translation: conv OIHW -> HWIO, linear OI -> IO, BatchNorm
weight/bias/running_mean/running_var -> scale/bias/mean/var.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    # torch tensor or numpy array
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _strip_prefix(name: str) -> str:
    """Reproduce the prefix surgery of resnet.py:139-145."""
    if name.startswith("backbone.base."):
        return name[len("backbone.base."):]
    if name.startswith("backbone."):
        return name[len("backbone."):]
    if name.startswith("base."):
        return name[len("base."):]
    return name


_SKIP_PATTERNS = ("fc.", "bottleneck", "classifier", "transformer")


def _backbone_key_to_flax(name: str):
    """Translate a torch backbone key to (collection, flax path tuple).

    Returns None for keys that should be skipped (fc head, num_batches
    tracked counters, etc).
    """
    if name.endswith("num_batches_tracked"):
        return None
    if any(p in name for p in _SKIP_PATTERNS):
        return None

    # layerX.Y.rest -> layerX_Y.rest
    name = re.sub(r"^layer(\d+)\.(\d+)\.", r"layer\1_\2.", name)
    # downsample.0 = conv, downsample.1 = bn
    name = name.replace("downsample.0", "downsample_conv")
    name = name.replace("downsample.1", "downsample_bn")

    parts = name.split(".")
    leaf = parts[-1]
    path = parts[:-1]

    if leaf == "weight":
        # conv or norm scale — decided by caller from tensor rank
        return ("?", tuple(path), "weight")
    if leaf == "bias":
        return ("params", tuple(path), "bias")
    if leaf == "running_mean":
        return ("batch_stats", tuple(path), "mean")
    if leaf == "running_var":
        return ("batch_stats", tuple(path), "var")
    return None


def _insert(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_backbone_state_dict(state_dict: Dict[str, Any]):
    """Convert a torch backbone state_dict -> (params, batch_stats) subtrees.

    Accepts raw torchvision dicts, reference self-trained dicts with
    ``base.``/``backbone.`` prefixes, and dicts nested under ``state_dict``.
    """
    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]

    params: Dict = {}
    batch_stats: Dict = {}
    for raw_name, tensor in state_dict.items():
        name = _strip_prefix(raw_name)
        spec = _backbone_key_to_flax(name)
        if spec is None:
            continue
        coll, path, kind = spec
        arr = _to_numpy(tensor)
        if kind == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                _insert(params, path + ("kernel",), arr.transpose(2, 3, 1, 0))
            else:  # norm scale
                _insert(params, path + ("scale",), arr)
        elif coll == "params":
            _insert(params, path + ("bias",), arr)
        else:
            _insert(batch_stats, path + (kind,), arr)
    return params, batch_stats


def convert_full_state_dict(state_dict: Dict[str, Any]):
    """Convert a full reference re-id checkpoint state_dict.

    Returns dict with 'params', 'batch_stats' and optionally 'centers'
    (the center-loss parameter, trained by its own optimizer).
    """
    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]

    backbone_sd = {}
    params: Dict = {}
    batch_stats: Dict = {}
    centers = None

    for name, tensor in state_dict.items():
        if name.startswith("backbone."):
            backbone_sd[name] = tensor
        elif name.startswith("bn."):
            arr = _to_numpy(tensor)
            leaf = name.split(".", 1)[1]
            if leaf == "weight":
                _insert(params, ("bnneck", "scale"), arr)
            elif leaf == "bias":
                _insert(params, ("bnneck", "bias"), arr)
            elif leaf == "running_mean":
                _insert(batch_stats, ("bnneck", "mean"), arr)
            elif leaf == "running_var":
                _insert(batch_stats, ("bnneck", "var"), arr)
        elif name == "fc_query.weight":
            _insert(params, ("fc_query", "kernel"), _to_numpy(tensor).T)
        elif name == "center_loss.centers":
            centers = _to_numpy(tensor)

    bb_params, bb_stats = convert_backbone_state_dict(backbone_sd)
    params["backbone"] = bb_params
    batch_stats["backbone"] = bb_stats
    out = {"params": params, "batch_stats": batch_stats}
    if centers is not None:
        out["centers"] = centers
    return out


def load_torch_file(path: str) -> Dict[str, Any]:
    """torch.load a .pth/.ckpt file on CPU (lazy torch import)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_pretrained_backbone(path: str):
    """Load an ImageNet/self-trained backbone file into flax subtrees.

    Equivalent of ``Baseline.__init__`` pretrained loading
    (/root/reference/modelling/baseline.py:84-87).
    """
    return convert_backbone_state_dict(load_torch_file(path))


def load_reference_checkpoint(path: str):
    """Load a full reference Lightning checkpoint into flax trees."""
    return convert_full_state_dict(load_torch_file(path))


def graft(params_tree, new_subtree, path: Tuple[str, ...] = ()):
    """Return ``params_tree`` with ``new_subtree`` merged at ``path``,
    keeping existing leaves not present in the new subtree (the reference
    ``load_param`` copies key-by-key, leaving unmatched keys untouched,
    resnet.py:135-154)."""
    import jax

    def merge(old, new):
        if isinstance(old, dict) and isinstance(new, dict):
            out = dict(old)
            for k, v in new.items():
                if k in out:
                    out[k] = merge(out[k], v)
                else:
                    out[k] = v
            return out
        # leaf replacement: keep dtype/shape discipline
        old_arr = np.asarray(old)
        new_arr = np.asarray(new)
        if old_arr.shape != new_arr.shape:
            raise ValueError(
                f"Shape mismatch during graft: {old_arr.shape} vs {new_arr.shape}"
            )
        return new_arr.astype(old_arr.dtype)

    tree = jax.tree_util.tree_map(lambda x: x, params_tree)  # shallow copy
    node = tree
    for p in path[:-1]:
        node = node[p]
    if path:
        node[path[-1]] = merge(node[path[-1]], new_subtree)
        return tree
    return merge(tree, new_subtree)
