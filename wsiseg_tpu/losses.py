"""Loss zoo — functional twins of the reference's 15 registered losses
(models/losses.py:8-40), jit-friendly and lazily constructed.

Conventions:
* classification/segmentation losses take ``logits`` with classes LAST
  ((B, C) or (B, H, W, C)) and integer ``targets`` ((B,) or (B, H, W));
* regression losses take ``(pred, target)`` float arrays of equal shape;
* every loss accepts ``sample_weight`` — per-example {0,1} (or soft) weights
  — because jit-friendly multi-task batches mask rows instead of boolean-
  indexing them (the reference routes rows dynamically,
  train_cellularity.py:86-103; SURVEY.md §7c).

Deliberate non-replications (SURVEY.md "known quirks"):
* the factory builds one loss, not all 15 eagerly (ref models/losses.py:23-39);
* jaccard uses the correct union ``|x|+|y|-|x∩y|`` — the reference sums
  ``x`` twice (models/losses.py:277);
* dice's ``ignore_index`` actually works (the reference's ``params.ignore_inde``
  typo silently disabled it, models/losses.py:29).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _mean(values: Array, weights: Optional[Array]) -> Array:
    """Weighted mean over the leading (sample) axis; plain mean if None."""
    if weights is None:
        return jnp.mean(values)
    w = weights.astype(values.dtype)
    # broadcast sample weights over trailing dims
    while w.ndim < values.ndim:
        w = w[..., None]
    denom = jnp.maximum(jnp.sum(w) * values.size / w.size, 1e-8)
    return jnp.sum(values * w) / denom


def _flatten_logits(logits: Array, targets: Array):
    c = logits.shape[-1]
    return logits.reshape(-1, c), targets.reshape(-1)


def _use_class_major(logits: Array, targets: Array) -> bool:
    """Dense/spatial targets with few classes: compute class-major.

    The flattened ``(N, C)`` layout puts C in the minor (lane) dimension;
    at segmentation-head widths (C=4) that wastes 31/32 lanes of every
    elementwise op and lowers label picks to gathers — measured +62 ms
    per forward at batch 16 × 512² on v5e (scripts/exp_r3n/o/p)."""
    return targets.ndim >= 2 and logits.shape[-1] <= 16


def _cm_logprob_parts(logits: Array):
    """(lp, lse): class-major logits (C, ...) and their logsumexp (...).

    log p_k = lp[k] - lse; p_k = exp(lp[k] - lse)."""
    lp = jnp.moveaxis(logits, -1, 0)
    m = jnp.max(lp, axis=0)
    lse = jnp.log(jnp.sum(jnp.exp(lp - m), axis=0)) + m
    return lp, lse


def _cm_select(t: Array, lp: Array, values=None) -> Array:
    """Σ_k (t==k)·x_k without a gather: C unrolled selects.

    ``values=None`` picks lp[k] (the label logit); a 1-D ``values`` array
    picks values[k] (per-class weights)."""
    out = jnp.zeros(t.shape, lp.dtype)
    for k in range(lp.shape[0]):
        v = lp[k] if values is None else values[k]
        out = out + jnp.where(t == k, v, 0)
    return out


def _sw_spatial(sample_weight: Array, targets: Array, dtype) -> Array:
    sw = sample_weight.reshape(
        sample_weight.shape + (1,) * (targets.ndim - sample_weight.ndim))
    return jnp.broadcast_to(sw, targets.shape).astype(dtype)


def _xent_class_major(logits: Array, targets: Array,
                      class_weights: Optional[Array],
                      ignore_index: int,
                      sample_weight: Optional[Array]) -> Array:
    """Spatial softmax CE computed with classes in the MAJOR axis.

    See ``_use_class_major``; the label pick becomes C unrolled selects.
    Same math as the flat path."""
    lp, lse = _cm_logprob_parts(logits)                 # (C, B, H, W)
    valid = targets != ignore_index
    t = jnp.where(valid, targets, 0)
    nll = lse - _cm_select(t, lp)
    w = valid.astype(lp.dtype)
    if class_weights is not None:
        w = w * _cm_select(t, lp, jnp.asarray(class_weights, lp.dtype))
    if sample_weight is not None:
        w = w * _sw_spatial(sample_weight, targets, lp.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def cross_entropy(logits: Array, targets: Array,
                  class_weights: Optional[Array] = None,
                  ignore_index: int = -1,
                  sample_weight: Optional[Array] = None) -> Array:
    """Weighted softmax CE with ignore_index (torch nn.CrossEntropyLoss
    semantics: weighted mean divides by the sum of applied class weights)."""
    if _use_class_major(logits, targets):
        return _xent_class_major(logits, targets, class_weights,
                                 ignore_index, sample_weight)
    lf, tf = _flatten_logits(logits, targets)
    valid = (tf != ignore_index)
    t = jnp.where(valid, tf, 0)
    logp = jax.nn.log_softmax(lf, axis=-1)
    nll = -jnp.take_along_axis(logp, t[:, None], axis=-1)[:, 0]
    w = valid.astype(lf.dtype)
    if class_weights is not None:
        w = w * jnp.asarray(class_weights, lf.dtype)[t]
    if sample_weight is not None:
        sw = jnp.broadcast_to(
            sample_weight.reshape(sample_weight.shape + (1,) * (targets.ndim - 1)),
            targets.shape).reshape(-1)
        w = w * sw.astype(lf.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def cross_entropy_s2d(logits: Array, targets: Array, f: int,
                      class_weights: Optional[Array] = None,
                      ignore_index: int = -1,
                      sample_weight: Optional[Array] = None) -> Array:
    """``cross_entropy`` on space-to-depth-layout spatial logits.

    ``logits`` is ``(B, H/f, W/f, f²·C)`` with sub-position-major / class-
    minor lanes (channel ``p = (fy·f + fx)·C + c`` — the layout the train
    s2d decoder tail emits, ``models/unet.py``) and ``targets`` is the
    matching ``(B, H/f, W/f, f²)`` space-to-depth of the int label map
    (``data/patches.seg_labels_s2d``). The pixel population is identical to
    the full-resolution pair, so value and gradients EXACTLY equal
    ``cross_entropy(depth_to_space(logits, f), labels)`` — but the full-res
    f32 materialization, its transpose and both backwards disappear
    (measured v5e b128@512²: 212 → 11 ms, scripts/exp_r4g.py).

    The per-class lane views keep f² ≥ 16 lanes each, so none of the
    elementwise work drops to the pathological 4-lane layout the
    class-major path exists to avoid (see ``_use_class_major``)."""
    c = logits.shape[-1] // (f * f)
    xs = [logits[..., k::c].astype(jnp.float32) for k in range(c)]
    m = xs[0]
    for k in range(1, c):
        m = jnp.maximum(m, xs[k])
    lse = jnp.log(sum(jnp.exp(xk - m) for xk in xs)) + m
    valid = targets != ignore_index
    t = jnp.where(valid, targets, 0)
    pick = jnp.zeros(t.shape, jnp.float32)
    for k in range(c):
        pick = pick + jnp.where(t == k, xs[k], 0)
    nll = lse - pick
    w = valid.astype(jnp.float32)
    if class_weights is not None:
        cw = jnp.asarray(class_weights, jnp.float32)
        wk = jnp.zeros(t.shape, jnp.float32)
        for k in range(c):
            wk = wk + jnp.where(t == k, cw[k], 0)
        w = w * wk
    if sample_weight is not None:
        w = w * _sw_spatial(sample_weight, targets, jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def bce(probs: Array, targets: Array,
        sample_weight: Optional[Array] = None) -> Array:
    """Binary cross entropy on probabilities (torch nn.BCELoss)."""
    p = jnp.clip(probs, 1e-7, 1 - 1e-7)
    t = targets.astype(p.dtype)
    loss = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
    return _mean(loss, sample_weight)


def focal(logits: Array, targets: Array, gamma: float = 2.0,
          class_weights: Optional[Array] = None,
          sample_weight: Optional[Array] = None) -> Array:
    """Multi-class focal loss (reference FocalLoss2d, models/losses.py:95-130)."""
    if _use_class_major(logits, targets):
        lp, lse = _cm_logprob_parts(logits)
        logpt = _cm_select(targets, lp) - lse
        pt = jnp.exp(logpt)
        if class_weights is not None:
            logpt = logpt * _cm_select(
                targets, lp, jnp.asarray(class_weights, lp.dtype))
        loss = -((1.0 - pt) ** gamma) * logpt
        if sample_weight is not None:
            sw = _sw_spatial(sample_weight, targets, lp.dtype)
            return jnp.sum(loss * sw) / jnp.maximum(jnp.sum(sw), 1e-8)
        return jnp.mean(loss)
    lf, tf = _flatten_logits(logits, targets)
    logp = jax.nn.log_softmax(lf, axis=-1)
    logpt = jnp.take_along_axis(logp, tf[:, None], axis=-1)[:, 0]
    pt = jnp.exp(logpt)
    if class_weights is not None:
        logpt = logpt * jnp.asarray(class_weights, lf.dtype)[tf]
    loss = -((1.0 - pt) ** gamma) * logpt
    if sample_weight is not None:
        sw = jnp.broadcast_to(
            sample_weight.reshape(sample_weight.shape + (1,) * (targets.ndim - 1)),
            targets.shape).reshape(-1).astype(lf.dtype)
        return jnp.sum(loss * sw) / jnp.maximum(jnp.sum(sw), 1e-8)
    return jnp.mean(loss)


def ohem(logits: Array, targets: Array, ratio: float = 0.5,
         scale_factor: float = 1.0 / 16.0,
         sample_weight: Optional[Array] = None) -> Array:
    """Online hard example mining (reference OHEM, models/losses.py:133-160).

    Downscales dense logits/labels by ``scale_factor`` (bilinear/nearest),
    ranks samples by loss, and averages CE over the hardest ``ratio``
    fraction — with a static top-k so it stays jit-compilable.
    """
    if logits.ndim == 4 and scale_factor != 1.0:
        b, h, w, c = logits.shape
        nh, nw = max(1, int(h * scale_factor)), max(1, int(w * scale_factor))
        logits = jax.image.resize(logits, (b, nh, nw, c), "linear")
        targets = jax.image.resize(targets.astype(jnp.int32), (b, nh, nw),
                                   "nearest")
    if _use_class_major(logits, targets):
        lp, lse = _cm_logprob_parts(logits)
        nll = lse - _cm_select(targets, lp)
        if sample_weight is not None:
            nll = nll * _sw_spatial(sample_weight, targets, lp.dtype)
        nll = nll.reshape(-1)
    else:
        lf, tf = _flatten_logits(logits, targets)
        logp = jax.nn.log_softmax(lf, axis=-1)
        nll = -jnp.take_along_axis(logp, tf[:, None], axis=-1)[:, 0]
        if sample_weight is not None:
            sw = jnp.broadcast_to(
                sample_weight.reshape(
                    sample_weight.shape + (1,) * (targets.ndim - 1)),
                targets.shape).reshape(-1).astype(lf.dtype)
            nll = nll * sw
    k = max(1, int(ratio * nll.shape[0]))
    hard, _ = jax.lax.top_k(nll, k)
    return jnp.mean(hard)


def conditional_entropy_ce(logits: Array, targets: Array,
                           class_weights: Optional[Array] = None,
                           sample_weight: Optional[Array] = None) -> Array:
    """Conditional entropy + cross entropy (reference ConditionalEntropyLoss,
    models/losses.py:163-178)."""
    if _use_class_major(logits, targets):
        lp, lse = _cm_logprob_parts(logits)
        ent = jnp.zeros_like(lse)                  # negative entropy Σ p·logp
        for k in range(lp.shape[0]):
            logp_k = lp[k] - lse
            ent = ent + jnp.exp(logp_k) * logp_k
        nll = lse - _cm_select(targets, lp)
        if class_weights is not None:
            nll = nll * _cm_select(
                targets, lp, jnp.asarray(class_weights, lp.dtype))
        loss = -ent + nll
        if sample_weight is not None:
            sw = _sw_spatial(sample_weight, targets, lp.dtype)
            return jnp.sum(loss * sw) / jnp.maximum(jnp.sum(sw), 1e-8)
        return jnp.mean(loss)
    lf, tf = _flatten_logits(logits, targets)
    logp = jax.nn.log_softmax(lf, axis=-1)
    p = jnp.exp(logp)
    ent = jnp.sum(p * logp, axis=-1)          # negative entropy
    nll = -jnp.take_along_axis(logp, tf[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        nll = nll * jnp.asarray(class_weights, lf.dtype)[tf]
    loss = -ent + nll
    if sample_weight is not None:
        sw = jnp.broadcast_to(
            sample_weight.reshape(sample_weight.shape + (1,) * (targets.ndim - 1)),
            targets.shape).reshape(-1).astype(lf.dtype)
        return jnp.sum(loss * sw) / jnp.maximum(jnp.sum(sw), 1e-8)
    return jnp.mean(loss)


def _one_hot_masked(targets: Array, num_classes: int, ignore_index):
    valid = jnp.ones_like(targets, dtype=bool) if ignore_index is None \
        else (targets != ignore_index)
    t = jnp.where(valid, targets, 0)
    oh = jax.nn.one_hot(t, num_classes)
    return oh * valid[..., None], valid


def dice(logits: Array, targets: Array,
         class_weights: Optional[Array] = None,
         ignore_index: Optional[int] = None,
         sample_weight: Optional[Array] = None,
         eps: float = 1e-4) -> Array:
    """Soft Dice (reference DiceLoss, models/losses.py:226-258): per-channel
    1 - 2|x∩y| / (|x|+|y|), class-weighted, summed / C."""
    num_classes = logits.shape[-1]
    if _use_class_major(logits, targets):
        lp, lse = _cm_logprob_parts(logits)
        valid = (jnp.ones(targets.shape, bool) if ignore_index is None
                 else targets != ignore_index)
        sw = (None if sample_weight is None
              else _sw_spatial(sample_weight, targets, lp.dtype))
        vf = valid.astype(lp.dtype)
        inters, denoms = [], []
        for k in range(num_classes):
            p_k = jnp.exp(lp[k] - lse)
            oh_k = ((targets == k) & valid).astype(lp.dtype)
            if sw is not None:
                p_k, oh_k = p_k * sw, oh_k * sw
            inters.append(jnp.sum(p_k * oh_k))
            denoms.append(jnp.sum(p_k * vf) + jnp.sum(oh_k) + eps)
        per_channel = 1.0 - 2.0 * jnp.stack(inters) / jnp.stack(denoms)
        if class_weights is not None:
            per_channel = per_channel * jnp.asarray(class_weights, lp.dtype)
        return jnp.sum(per_channel) / num_classes
    probs = jax.nn.softmax(logits, axis=-1)
    oh, valid = _one_hot_masked(targets, num_classes, ignore_index)
    if sample_weight is not None:
        sw = sample_weight.reshape(sample_weight.shape + (1,) * (probs.ndim - sample_weight.ndim))
        probs = probs * sw
        oh = oh * sw
    axes = tuple(range(probs.ndim - 1))
    inter = jnp.sum(probs * oh, axis=axes)
    denom = jnp.sum(probs * valid[..., None], axis=axes) + jnp.sum(oh, axis=axes) + eps
    per_channel = 1.0 - (2.0 * inter) / denom
    if class_weights is not None:
        per_channel = per_channel * jnp.asarray(class_weights, probs.dtype)
    return jnp.sum(per_channel) / num_classes


def jaccard(logits: Array, targets: Array, eps: float = 1.0,
            sample_weight: Optional[Array] = None) -> Array:
    """Soft IoU loss, mean over channels."""
    num_classes = logits.shape[-1]
    if _use_class_major(logits, targets):
        lp, lse = _cm_logprob_parts(logits)
        sw = (None if sample_weight is None
              else _sw_spatial(sample_weight, targets, lp.dtype))
        ious = []
        for k in range(num_classes):
            p_k = jnp.exp(lp[k] - lse)
            oh_k = (targets == k).astype(lp.dtype)
            if sw is not None:
                p_k, oh_k = p_k * sw, oh_k * sw
            inter = jnp.sum(p_k * oh_k)
            union = jnp.sum(p_k) + jnp.sum(oh_k) - inter
            ious.append(1.0 - inter / (union + eps))
        return jnp.mean(jnp.stack(ious))
    probs = jax.nn.softmax(logits, axis=-1)
    oh = jax.nn.one_hot(targets, num_classes)
    if sample_weight is not None:
        sw = sample_weight.reshape(sample_weight.shape + (1,) * (probs.ndim - sample_weight.ndim))
        probs, oh = probs * sw, oh * sw
    axes = tuple(range(probs.ndim - 1))
    inter = jnp.sum(probs * oh, axis=axes)
    union = jnp.sum(probs, axes) + jnp.sum(oh, axes) - inter
    return jnp.mean(1.0 - inter / (union + eps))


def tversky(logits: Array, targets: Array, alpha: float = 1.0,
            beta: float = 1.0, eps: float = 1e-6,
            sample_weight: Optional[Array] = None) -> Array:
    """Tversky loss (reference TverskyLoss, models/losses.py:189-223)."""
    num_classes = logits.shape[-1]
    if _use_class_major(logits, targets):
        lp, lse = _cm_logprob_parts(logits)
        sw = (None if sample_weight is None
              else _sw_spatial(sample_weight, targets, lp.dtype))
        tvs = []
        for k in range(num_classes):
            p_k = jnp.exp(lp[k] - lse)
            oh_k = (targets == k).astype(lp.dtype)
            if sw is not None:
                p_k, oh_k = p_k * sw, oh_k * sw
            inter = jnp.sum(p_k * oh_k) + eps
            fps = jnp.sum(p_k * (1 - oh_k))
            fns = jnp.sum((1 - p_k) * oh_k)
            tvs.append(1.0 - inter / (inter + alpha * fps + beta * fns))
        return jnp.mean(jnp.stack(tvs))
    probs = jax.nn.softmax(logits, axis=-1)
    oh = jax.nn.one_hot(targets, num_classes)
    if sample_weight is not None:
        sw = sample_weight.reshape(sample_weight.shape + (1,) * (probs.ndim - sample_weight.ndim))
        probs, oh = probs * sw, oh * sw
    axes = tuple(range(probs.ndim - 1))
    inter = jnp.sum(probs * oh, axes) + eps
    fps = jnp.sum(probs * (1 - oh), axes)
    fns = jnp.sum((1 - probs) * oh, axes)
    tv = inter / (inter + alpha * fps + beta * fns)
    return jnp.mean(1.0 - tv)


def zeroloss(*args, **kwargs) -> Array:
    return jnp.asarray(0.0)


# ---- regression losses (reference models/losses.py:49-83) ----

def mse(pred: Array, target: Array, sample_weight=None) -> Array:
    return _mean((pred - target) ** 2, sample_weight)


def l1(pred: Array, target: Array, sample_weight=None) -> Array:
    return _mean(jnp.abs(pred - target), sample_weight)


def rmse(pred: Array, target: Array, sample_weight=None) -> Array:
    return jnp.sqrt(mse(pred, target, sample_weight))


def logcosh(pred: Array, target: Array, sample_weight=None) -> Array:
    e = pred - target
    return _mean(jnp.log(jnp.cosh(e + 1e-12)), sample_weight)


def xtanh(pred: Array, target: Array, sample_weight=None) -> Array:
    e = pred - target
    return _mean(e * jnp.tanh(e), sample_weight)


def xsigmoid(pred: Array, target: Array, sample_weight=None) -> Array:
    e = pred - target
    return _mean(2 * e / (1 + jnp.exp(-e)) - e, sample_weight)


_REGISTRY = {
    "xent": cross_entropy,
    "bce": bce,
    "focal": focal,
    "ohem": ohem,
    "cent": conditional_entropy_ce,
    "dice": dice,
    "jaccard": jaccard,
    "tversky": tversky,
    "zeroloss": zeroloss,
    "mse": mse,
    "l1": l1,
    "rmse": rmse,
    "logcosh": logcosh,
    "xtanh": xtanh,
    "xsigmoid": xsigmoid,
}


def loss_fn(name: str, **fixed_kwargs) -> Callable[..., Array]:
    """Factory (reference `lossfn`, models/losses.py:8-40), constructing only
    the requested loss. ``fixed_kwargs`` are bound (e.g. class_weights)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown loss {name!r}; known: {sorted(_REGISTRY)}")
    base = _REGISTRY[name]
    if not fixed_kwargs:
        return base

    def bound(*args, **kw):
        return base(*args, **{**fixed_kwargs, **kw})

    bound.__name__ = f"{name}_bound"
    return bound
