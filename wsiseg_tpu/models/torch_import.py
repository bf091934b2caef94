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


_DEC_RE = re.compile(
    r"^decoder\.blocks\.(\d+)\.conv(\d)\.([01])\.(.+)$")
# FPN family: lateral 1×1 convs + per-pyramid segmentation blocks
_FPN_LAT_RE = re.compile(r"^decoder\.lat(\d)\.(weight|bias)$")
_FPN_SEG_RE = re.compile(r"^decoder\.seg(\d)\.conv(\d)\.([01])\.(.+)$")
# PSPNet family: pooled-pyramid branches + fuse conv
_PSP_RE = re.compile(r"^decoder\.psp(\d)\.([01])\.(.+)$")
_PSP_FUSE_RE = re.compile(r"^decoder\.fuse\.([01])\.(.+)$")


def convert_ynet_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, Dict]:
    """Convert a FULL reference-model state_dict (smp model + monkey-patched
    heads, the contents of a reference ``torch.save`` checkpoint,
    train.py:111-118) into YNet variables — all four decoder families the
    reference selects via ``eval('smp.'+args.model_name)`` (train.py:29,
    myargs.py:9-10).

    Naming handled (``.0``/``.1`` = Sequential(conv, bn) indices):
      encoder.*                        → torchvision ResNet (see above)
      decoder.blocks.{i}.conv{k}.0.*   → decoder/block{i}/conv{k} (conv)
      decoder.blocks.{i}.conv{k}.1.*   → decoder/block{i}/bn{k} (BN)
          (Unet k∈{1,2}; Linknet k∈{1,2,3} — same layout, same mapping)
      decoder.lat{n}.*                 → decoder/lat{n} (FPN lateral 1×1)
      decoder.seg{n}.conv{k}.{0,1}.*   → decoder/seg{n}_conv{k} / seg{n}_bn{k}
      decoder.psp{b}.{0,1}.*           → decoder/psp{b}_conv / psp{b}_bn
      decoder.fuse.{0,1}.*             → decoder/fuse_conv / fuse_bn
      segmentation_head.0.*            → decoder/seg_head
      classifier.fc.0.*                → classifier/fc
      regressor.fc.{0,2}.*             → regressor/fc{1,2}
    Unrecognized NON-decoder keys are skipped (the reference's own
    partial-load semantics, resnets_shift.py:230-240). Decoder keys are
    guarded: a checkpoint that carries ``decoder.*`` entries of which NONE
    map (e.g. a real ``smp`` FPN/PSPNet/Linknet state_dict, whose internal
    naming differs from the in-repo replicas — PARITY.md "deliberate
    narrowings") raises ValueError instead of silently leaving the decoder
    randomly initialized; a partial decoder match warns with the skipped
    keys. Grafting additionally validates every mapped leaf against the
    target model tree, so a family/arch mismatch between checkpoint and
    config fails loudly (KeyError/ValueError).
    """
    enc = convert_resnet_state_dict(
        {k[len("encoder."):]: v for k, v in sd.items()
         if k.startswith("encoder.")})
    params: Dict = {"encoder": enc["params"]} if enc["params"] else {}
    stats: Dict = {"encoder": enc["batch_stats"]} if enc["batch_stats"] else {}

    def put_bn(module, leaf, v):
        if leaf == "weight":
            _set(params, module + ("scale",), v)
        elif leaf == "bias":
            _set(params, module + ("bias",), v)
        elif leaf == "running_mean":
            _set(stats, module + ("mean",), v)
        elif leaf == "running_var":
            _set(stats, module + ("var",), v)

    def put_conv_bn(conv_path, bn_path, sub, leaf, v):
        if sub == "0" and leaf == "weight":
            _set(params, conv_path + ("kernel",), _conv_kernel(v))
        elif sub == "0" and leaf == "bias":
            _set(params, conv_path + ("bias",), v)
        elif sub == "1":
            put_bn(bn_path, leaf, v)

    dec_unmatched = []
    dec_matched = 0
    for key, v in sd.items():
        m = _DEC_RE.match(key)
        if m is not None:
            i, k, sub, leaf = m.groups()
            block = ("decoder", f"block{i}")
            put_conv_bn(block + (f"conv{k}",), block + (f"bn{k}",), sub,
                        leaf, v)
            dec_matched += 1
            continue
        m = _FPN_SEG_RE.match(key)
        if m is not None:
            n, k, sub, leaf = m.groups()
            put_conv_bn(("decoder", f"seg{n}_conv{k}"),
                        ("decoder", f"seg{n}_bn{k}"), sub, leaf, v)
            dec_matched += 1
            continue
        m = _FPN_LAT_RE.match(key)
        if m is not None:
            n, leaf = m.groups()
            if leaf == "weight":
                _set(params, ("decoder", f"lat{n}", "kernel"),
                     _conv_kernel(v))
            else:
                _set(params, ("decoder", f"lat{n}", "bias"), v)
            dec_matched += 1
            continue
        m = _PSP_RE.match(key)
        if m is not None:
            b, sub, leaf = m.groups()
            put_conv_bn(("decoder", f"psp{b}_conv"),
                        ("decoder", f"psp{b}_bn"), sub, leaf, v)
            dec_matched += 1
            continue
        m = _PSP_FUSE_RE.match(key)
        if m is not None:
            sub, leaf = m.groups()
            put_conv_bn(("decoder", "fuse_conv"), ("decoder", "fuse_bn"),
                        sub, leaf, v)
            dec_matched += 1
            continue
        if key.startswith("decoder."):
            dec_unmatched.append(key)
            continue
        if key == "segmentation_head.0.weight":
            _set(params, ("decoder", "seg_head", "kernel"), _conv_kernel(v))
        elif key == "segmentation_head.0.bias":
            _set(params, ("decoder", "seg_head", "bias"), v)
        elif key == "classifier.fc.0.weight":
            _set(params, ("classifier", "fc", "kernel"),
                 np.transpose(np.asarray(v)))
        elif key == "classifier.fc.0.bias":
            _set(params, ("classifier", "fc", "bias"), v)
        elif key == "regressor.fc.0.weight":
            _set(params, ("regressor", "fc1", "kernel"),
                 np.transpose(np.asarray(v)))
        elif key == "regressor.fc.0.bias":
            _set(params, ("regressor", "fc1", "bias"), v)
        elif key == "regressor.fc.2.weight":
            _set(params, ("regressor", "fc2", "kernel"),
                 np.transpose(np.asarray(v)))
        elif key == "regressor.fc.2.bias":
            _set(params, ("regressor", "fc2", "bias"), v)

    if dec_unmatched:
        # Count only decoder.* regex hits — segmentation_head.0.* also lands
        # under params["decoder"]["seg_head"], so probing the params tree
        # would mask a checkpoint whose decoder.* keys ALL failed to map.
        if dec_matched == 0:
            raise ValueError(
                "checkpoint carries decoder.* keys but NONE map to this "
                "framework's decoder naming (likely a real smp state_dict "
                "whose internal layout differs from the in-repo replicas — "
                "see PARITY.md 'deliberate narrowings'); refusing to graft "
                "a randomly-initialized decoder silently. First unmatched: "
                f"{dec_unmatched[:5]}")
        import warnings
        warnings.warn(
            f"convert_ynet_state_dict: {len(dec_unmatched)} decoder key(s) "
            f"did not map and keep their random init, e.g. "
            f"{dec_unmatched[:3]}", stacklevel=2)
    return {"params": params, "batch_stats": stats}


def load_pretrained(path: str) -> Dict[str, np.ndarray]:
    """Load a state_dict-like mapping of numpy arrays from a torch ``.pt``/
    ``.pth`` file (requires torch, CPU) or an ``.npz``. Unwraps reference
    checkpoints ({'state_dict': ...}) and strips ``module.`` prefixes."""
    if path.endswith(".npz"):
        raw = dict(np.load(path))
    else:
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        raw = {k: v.detach().cpu().numpy() for k, v in obj.items()
               if hasattr(v, "detach")}
    out = {}
    for k, v in raw.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v)
    return out


def apply_pretrained(variables: Dict, path: str,
                     encoder_name: str = "encoder") -> Dict:
    """Graft pretrained torch weights from ``path`` into model variables.

    The reference ALWAYS trains from ImageNet-initialized encoders
    (train.py:29 ``smp.Unet('resnet18', 'imagenet')``; resnets_shift.py:
    230-240 partial state_dict load) — this is the equivalent entry point,
    reached from every trainer via ``cfg.pretrained_pth``.

    Dispatch: keys starting with ``encoder.``/``decoder.`` → full-model
    convert (reference checkpoint); plain torchvision naming (conv1.*,
    layer*) → encoder-only graft into ``encoder_name``. Missing keys keep
    their random init (partial-load semantics)."""
    sd = load_pretrained(path)
    if any(k.startswith(("encoder.", "decoder.", "segmentation_head."))
           for k in sd):
        converted = convert_ynet_state_dict(sd)
        return graft_encoder(variables, converted, encoder_name="")
    converted = convert_resnet_state_dict(sd)
    return graft_encoder(variables, converted, encoder_name=encoder_name)


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
