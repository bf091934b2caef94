"""Jitted train/eval steps for every trainer family.

The reference's five trainers share one skeleton (SURVEY.md §1.6); here each
is a pure step function closed over the model + optimizer and compiled once.
Mixed-task batches are handled with per-row task masks and masked losses
instead of the reference's shape-dynamic boolean indexing
(``encoding[0][is_cls]``, train_cellularity.py:87) — identical math, static
shapes (SURVEY.md §7 build plan item 6).

Batches are dicts of device arrays:
  image      (B, H, W, 3) float32, already normalized
  seg_label  (B, H, W) int32      (zeros where not seg)
  cls_label  (B,) int32           (-1 where not cls)
  reg_label  (B,) float32         (0 where not reg)
  is_cls / is_reg / is_seg  (B,) float32 {0, 1}
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from wsiseg_tpu import losses
from wsiseg_tpu.config import Config
from wsiseg_tpu.train.state import TrainState


def _seg_xent(out, batch, class_weights, sample_weight):
    """Segmentation cross entropy, s2d-aware.

    When the model tagged its output with ``seg_s2d`` (the train s2d tail
    emitting cell-layout logits, models/ynet.py) and the host batch carries
    the matching ``seg_label_s2d`` (data/patches.add_s2d_seg_labels), the
    loss runs entirely in the s2d domain — exact same value/grads, none of
    the full-res f32 materializations (losses.cross_entropy_s2d). Either
    piece missing → the canonical full-resolution path, via an explicit
    depth_to_space when only the labels are missing."""
    seg, f = out["seg"], out.get("seg_s2d")
    if f and "seg_label_s2d" in batch:
        return losses.cross_entropy_s2d(
            seg, batch["seg_label_s2d"], f, class_weights=class_weights,
            sample_weight=sample_weight)
    if f:
        from wsiseg_tpu.models.fast_decoder import depth_to_space
        seg = depth_to_space(seg, f)
    return losses.cross_entropy(seg, batch["seg_label"],
                                class_weights=class_weights,
                                sample_weight=sample_weight)


def _make_grads_fn(loss_fn: Callable, grad_accum: int) -> Callable:
    """(params, batch_stats, batch, rng) -> (grads, aux) for any loss_fn
    whose aux dict carries scalars + a ``batch_stats`` entry.

    ``grad_accum > 1`` splits the batch into that many microbatches and
    accumulates grads over a ``lax.scan`` before the caller's ONE optimizer
    update — peak activation memory drops by the accumulation factor,
    unlocking batch sizes whose single-pass graph exceeds HBM (b192+ at
    512²; scripts/exp_r6c.py). BN batch statistics are computed per
    microbatch (running stats chain through the scan) — the standard
    accumulation semantics; grads are exactly the mean of microbatch grads
    (f64 oracle: tests/test_train_e2e.py). Aux scalars (losses, acc) are
    the mean of per-microbatch values; the dropout rng is folded per
    microbatch."""

    def grads_single(params, batch_stats, batch, rng):
        return jax.grad(loss_fn, has_aux=True)(params, batch_stats,
                                               batch, rng)

    if grad_accum <= 1:
        return grads_single

    def grads_accum(params, batch_stats, batch, rng):
        ga = grad_accum
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if b % ga:
            raise ValueError(
                f"batch size {b} not divisible by grad_accum {ga}")
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((ga, x.shape[0] // ga) + x.shape[1:]),
            batch)

        def body(carry, xs):
            stats, gacc, lacc = carry
            mb, k = xs
            g, aux = jax.grad(loss_fn, has_aux=True)(
                params, stats, mb, jax.random.fold_in(rng, k))
            stats = aux.pop("batch_stats")
            gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
            lacc = jax.tree_util.tree_map(jnp.add, lacc, aux)
            return (stats, gacc, lacc), None

        # aux structure without running the model (trace-time only)
        mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
        _, aux_shape = jax.eval_shape(
            jax.grad(loss_fn, has_aux=True), params, batch_stats, mb0, rng)
        aux_shape.pop("batch_stats")
        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, params)
        zeros_l = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), aux_shape)
        (stats, gsum, lsum), _ = jax.lax.scan(
            body, (batch_stats, zeros_g, zeros_l),
            (micro, jnp.arange(ga)))
        grads = jax.tree_util.tree_map(lambda g: g / ga, gsum)
        aux = jax.tree_util.tree_map(lambda v: v / ga, lsum)
        aux["batch_stats"] = stats
        return grads, aux

    return grads_accum


def make_hybrid_train_step(model, tx: optax.GradientTransformation,
                           cfg: Config,
                           cls_weights: Optional[jnp.ndarray] = None,
                           seg_weights: Optional[jnp.ndarray] = None,
                           axis_name: str | None = None,
                           grad_accum: Optional[int] = None) -> Callable:
    """Three-head step: xent(cls) + mse(reg) + xent(seg), summed — the
    ``train_cellularity.py:86-108`` recipe (the consistent trainer per
    SURVEY.md quirk list). ``grad_accum`` defaults to ``cfg.grad_accum``
    (the ``--grad_accum`` flag); see :func:`_make_grads_fn`."""

    def loss_fn(params, batch_stats, batch, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        l_cls = losses.cross_entropy(
            out["cls"], batch["cls_label"], class_weights=cls_weights,
            ignore_index=-1, sample_weight=batch["is_cls"])
        l_reg = losses.mse(
            out["reg"][:, 0], batch["reg_label"], sample_weight=batch["is_reg"])
        l_seg = _seg_xent(out, batch, seg_weights, batch["is_seg"])
        total = l_cls + l_reg + l_seg
        aux = {"loss": total, "loss_cls": l_cls, "loss_reg": l_reg,
               "loss_seg": l_seg, "batch_stats": mutated["batch_stats"]}
        return total, aux

    grads_fn = _make_grads_fn(
        loss_fn, cfg.grad_accum if grad_accum is None else grad_accum)

    def step(state: TrainState, batch: Dict, rng) -> tuple[TrainState, Dict]:
        grads, aux = grads_fn(state.params, state.batch_stats, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = {k: (jax.lax.pmean(v, axis_name) if k != "batch_stats" else v)
                   for k, v in aux.items()}
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params,
                                  batch_stats=aux.pop("batch_stats"),
                                  opt_state=new_opt, step=state.step + 1)
        return new_state, aux

    return step


def make_seg_train_step(model, tx: optax.GradientTransformation, cfg: Config,
                        class_weights: Optional[jnp.ndarray] = None,
                        with_dice: bool = False,
                        axis_name: str | None = None,
                        grad_accum: Optional[int] = None) -> Callable:
    """Pure-segmentation step (train_ssr.py:41-60: selectable loss on the
    decoder output, optionally + dice)."""
    base = losses.loss_fn(
        cfg.loss if cfg.loss in ("xent", "focal", "ohem", "cent", "dice",
                                 "jaccard", "tversky") else "xent")

    def loss_fn(params, batch_stats, batch, rng):
        seg = model.apply({"params": params, "batch_stats": batch_stats},
                          batch["image"], train=True,
                          mutable=["batch_stats"], rngs={"dropout": rng})
        seg, mutated = seg
        f = None
        if isinstance(seg, dict):
            f = seg.get("seg_s2d")
            seg = seg["seg"]
        if (f and cfg.loss == "xent" and not with_dice
                and "seg_label_s2d" in batch):
            # s2d-domain xent (exact; see _seg_xent)
            total = losses.cross_entropy_s2d(
                seg, batch["seg_label_s2d"], f,
                class_weights=class_weights)
        else:
            if f:
                from wsiseg_tpu.models.fast_decoder import depth_to_space
                seg = depth_to_space(seg, f)
            kwargs = {}
            if cfg.loss in ("xent", "focal", "cent", "dice"):
                kwargs["class_weights"] = class_weights
            total = base(seg, batch["seg_label"], **kwargs)
            if with_dice:
                total = total + losses.dice(seg, batch["seg_label"],
                                            class_weights=class_weights)
        return total, {"loss": total, "batch_stats": mutated["batch_stats"]}

    grads_fn = _make_grads_fn(
        loss_fn, cfg.grad_accum if grad_accum is None else grad_accum)

    def step(state, batch, rng):
        grads, aux = grads_fn(state.params, state.batch_stats, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=aux.pop("batch_stats"),
            opt_state=new_opt, step=state.step + 1)
        return new_state, aux

    return step


def make_cls_train_step(model, tx: optax.GradientTransformation, cfg: Config,
                        class_weights: Optional[jnp.ndarray] = None,
                        method=None,
                        axis_name: str | None = None,
                        grad_accum: Optional[int] = None) -> Callable:
    """Pure patch-classification step (train_p.py:55-80). Note: with
    ``grad_accum > 1`` the reported ``acc`` is the mean of per-microbatch
    accuracies (differs from whole-batch accuracy only when microbatch
    mask counts differ)."""

    def loss_fn(params, batch_stats, batch, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng}, **({"method": method} if method else {}))
        if isinstance(out, dict):
            out = out["cls"]
        total = losses.cross_entropy(out, batch["cls_label"],
                                     class_weights=class_weights,
                                     ignore_index=-1,
                                     sample_weight=batch.get("is_cls"))
        acc_w = batch.get("is_cls", jnp.ones_like(batch["cls_label"], jnp.float32))
        correct = (jnp.argmax(out, -1) == batch["cls_label"]).astype(jnp.float32)
        acc = jnp.sum(correct * acc_w) / jnp.maximum(jnp.sum(acc_w), 1e-8)
        return total, {"loss": total, "acc": acc,
                       "batch_stats": mutated["batch_stats"]}

    grads_fn = _make_grads_fn(
        loss_fn, cfg.grad_accum if grad_accum is None else grad_accum)

    def step(state, batch, rng):
        grads, aux = grads_fn(state.params, state.batch_stats, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=aux.pop("batch_stats"),
            opt_state=new_opt, step=state.step + 1)
        return new_state, aux

    return step


def make_hr_train_step(model, tx: optax.GradientTransformation, cfg: Config,
                       class_weights: Optional[jnp.ndarray] = None,
                       axis_name: str | None = None,
                       grad_accum: Optional[int] = None) -> Callable:
    """Multi-patch region-ensemble step: loss on the ensemble logits
    (train_hr.py:58-68). batch: images (B, P, H, W, 3), label (B,)."""

    def loss_fn(params, batch_stats, batch, rng):
        (per_patch, ensemble), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        total = losses.cross_entropy(ensemble, batch["cls_label"],
                                     class_weights=class_weights)
        acc = jnp.mean((jnp.argmax(ensemble, -1) == batch["cls_label"])
                       .astype(jnp.float32))
        return total, {"loss": total, "acc": acc,
                       "batch_stats": mutated["batch_stats"]}

    grads_fn = _make_grads_fn(
        loss_fn, cfg.grad_accum if grad_accum is None else grad_accum)

    def step(state, batch, rng):
        grads, aux = grads_fn(state.params, state.batch_stats, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=aux.pop("batch_stats"),
            opt_state=new_opt, step=state.step + 1)
        return new_state, aux

    return step
