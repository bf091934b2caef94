"""Import torchvision-style ResNet weights into flax encoder variables.

Enables the parity target "per-patch logits match the PyTorch reference
within fp tolerance" (BASELINE.md): the reference initializes from
torchvision ImageNet checkpoints (resnets_shift.py:230-240, smp encoders).
This converter maps a ``state_dict``-like mapping of numpy arrays (no torch
dependency required — call ``{k: v.numpy() for k, v in sd.items()}`` first)
onto :class:`wsiseg_tpu.models.resnet.ResNetEncoder` variables.

Key mapping (torchvision → flax):

====================================  =====================================
``conv1.weight``                      ``params/stem_conv/kernel`` (OIHW→HWIO)
``bn1.{weight,bias}``                 ``params/stem_bn/{scale,bias}``
``bn1.running_{mean,var}``            ``batch_stats/stem_bn/{mean,var}``
``layer{i}.{j}.conv{k}.weight``       ``params/layer{i}_{j}/conv{k}/kernel``
``layer{i}.{j}.bn{k}.*``              ``.../bn{k}/...``
``layer{i}.{j}.downsample.0.weight``  ``.../down_conv/kernel``
``layer{i}.{j}.downsample.1.*``       ``.../down_bn/...``
``fc.*``                              ignored (heads are task-specific)
====================================  =====================================
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


_LAYER_RE = re.compile(
    r"^layer(\d+)\.(\d+)\.(conv\d|bn\d|downsample\.0|downsample\.1)\.(.+)$")


def convert_resnet_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Dict]:
    """Returns {'params': ..., 'batch_stats': ...} for ResNetEncoder."""
    params: Dict = {}
    stats: Dict = {}

    def put_bn(module: Tuple[str, ...], leaf: str, v: np.ndarray) -> None:
        if leaf == "weight":
            _set(params, module + ("scale",), v)
        elif leaf == "bias":
            _set(params, module + ("bias",), v)
        elif leaf == "running_mean":
            _set(stats, module + ("mean",), v)
        elif leaf == "running_var":
            _set(stats, module + ("var",), v)
        # num_batches_tracked: ignored

    for key, v in sd.items():
        if key == "conv1.weight":
            _set(params, ("stem_conv", "kernel"), _conv_kernel(v))
        elif key.startswith("bn1."):
            put_bn(("stem_bn",), key.split(".", 1)[1], v)
        elif key.startswith("fc."):
            continue
        else:
            m = _LAYER_RE.match(key)
            if m is None:
                continue
            i, j, sub, leaf = m.group(1), m.group(2), m.group(3), m.group(4)
            block = f"layer{i}_{j}"
            if sub.startswith("conv"):
                _set(params, (block, sub, "kernel"), _conv_kernel(v))
            elif sub.startswith("bn"):
                put_bn((block, sub), leaf, v)
            elif sub == "downsample.0":
                _set(params, (block, "down_conv", "kernel"), _conv_kernel(v))
            elif sub == "downsample.1":
                put_bn((block, "down_bn"), leaf, v)

    return {"params": params, "batch_stats": stats}


def graft_encoder(variables: Dict, converted: Dict,
                  encoder_name: str = "encoder") -> Dict:
    """Replace the encoder subtree of a larger model's variables (e.g. YNet)
    with converted torchvision weights. Shapes are validated leaf-by-leaf."""
    import jax

    def check(old, new, path=""):
        for k, v in new.items():
            if k not in old:
                raise KeyError(f"converted key {path}/{k} not in model")
            if isinstance(v, dict):
                check(old[k], v, f"{path}/{k}")
            elif tuple(old[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {path}/{k}: model {old[k].shape} "
                    f"vs torch {v.shape}")

    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow-ish copy
    for col in ("params", "batch_stats"):
        if col in converted and converted[col]:
            tgt = out[col][encoder_name] if encoder_name else out[col]
            check(tgt, converted[col])
            merged = {**tgt, **{k: _merge(tgt.get(k, {}), v)
                                for k, v in converted[col].items()}}
            if encoder_name:
                out[col] = {**out[col], encoder_name: merged}
            else:
                out[col] = merged
    return out


def _merge(old, new):
    if not isinstance(new, dict):
        return new
    return {**old, **{k: _merge(old.get(k, {}), v) for k, v in new.items()}}
