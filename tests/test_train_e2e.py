"""Minimum end-to-end slice (SURVEY.md §7 item 4): synthetic patch store →
PatchDataset → jitted hybrid train step → checkpoint → resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data import metadata as md
from wsiseg_tpu.data.patches import PatchDataset, cls_weights, normalize_batch_images
from wsiseg_tpu.models.ynet import init_ynet
from wsiseg_tpu.optim import build_optimizer
from wsiseg_tpu.train.loop import Trainer
from wsiseg_tpu.train.state import (TrainState, latest_checkpoint,
                                    restore_checkpoint, save_checkpoint)
from wsiseg_tpu.train.steps import make_hybrid_train_step


TILE = 32


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    """Synthetic patch store: class-colored tiles (cls), gradient tiles with
    masks (seg), brightness-coded tiles (reg)."""
    root = tmp_path_factory.mktemp("train_store")
    rng = np.random.RandomState(0)
    store = {}
    for i in range(24):
        kind = i % 3
        img = rng.randint(0, 60, (TILE, TILE, 3)).astype(np.uint8)
        if kind == 0:   # cls: class c gets channel c-1 brightened
            c = (i // 3) % 3 + 1
            img[..., c - 1] += 180
            label = int(c)
        elif kind == 1:  # seg: top half class 1, bottom half 0
            mask = np.zeros((TILE, TILE), np.uint8)
            mask[: TILE // 2] = 1
            img[: TILE // 2, :, 0] += 160
            mpth = str(root / f"m{i}.png")
            Image.fromarray(mask).save(mpth)
            label = mpth
        else:            # reg: target = mean brightness
            img = (img.astype(np.int32) + (i * 7) % 160).clip(0, 255).astype(np.uint8)
            label = float(img.mean() / 255.0)
        ipth = str(root / f"p{i}.png")
        Image.fromarray(img).save(ipth)
        md.add_patch(store, "synthetic", i, ipth, label)
    md.save_store(store, str(root))
    return str(root)


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp("ckpts"))
    return default_config(tile_w=TILE, tile_h=TILE, batch_size=8,
                          compute_dtype="float32", lr=3e-4,
                          model_save_pth=save_dir, save_models=0,
                          validate_model=0, loss="xent")


def test_dataset_batches(store_dir, cfg):
    ds = PatchDataset(store_dir, cfg)
    batches = list(ds.batches())
    assert sum(b["image"].shape[0] for b in batches) == 24
    b = batches[0]
    assert b["image"].shape[1:] == (TILE, TILE, 3)
    # every row has exactly one task flag
    flags = b["is_cls"] + b["is_reg"] + b["is_seg"]
    np.testing.assert_array_equal(flags, np.ones_like(flags))


def test_cls_weights(store_dir, cfg):
    wc, ws = cls_weights(store_dir, cfg)
    assert wc.shape == (4,)
    assert wc.max() <= 1.0 + 1e-6
    assert ws[0] > 0 and ws[1] > 0  # seg masks contain classes 0 and 1


def test_hybrid_training_learns_and_checkpoints(store_dir, cfg):
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_hybrid_train_step(model, tx, cfg))

    def preprocess(batch, rng):
        out = dict(batch)
        out["image"] = normalize_batch_images(batch["image"], cfg, rng, train=True)
        return out

    ds = PatchDataset(store_dir, cfg)
    trainer = Trainer(cfg, state, step,
                      make_batches=lambda: ds.batches(drop_remainder=True),
                      preprocess_batch=jax.jit(preprocess),
                      log_fn=lambda s: None)
    state = trainer.run(start_epoch=1, num_epochs=8)

    first = trainer.history[0]["loss"]
    last = trainer.history[-1]["loss"]
    assert last < first, f"loss did not decrease: {first} -> {last}"

    # checkpoint + resume semantics (epoch + 1)
    pth = save_checkpoint(state, cfg, epoch=8)
    assert latest_checkpoint(cfg.model_save_pth) == pth
    fresh = TrainState.create(init_ynet(cfg, jax.random.PRNGKey(1))[1], tx)
    restored, start_epoch = restore_checkpoint(pth, fresh)
    assert start_epoch == 9
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    assert int(restored.step) == int(state.step)


def test_grad_accum_matches_manual_microbatches():
    """grad_accum=2 equals an EXPLICIT two-microbatch accumulation (same
    loss_fn, same rng folds, grads averaged, BN running stats chained,
    one sgd update) — validates the scan plumbing exactly. Run in f64:
    an untrained full-depth net has grads of magnitude ~650 whose f32
    values are conditioning-chaotic — eager-vs-jit of the SAME microbatch
    already differs ~10% relative at f32, while f64 agrees to ~1e-9
    relative (the documented envelope, CLAUDE.md; probe /tmp/ga_repro64
    measured max abs grad diff 1.2e-6 on |g|≈650). A full-batch
    comparison is deliberately NOT asserted: BN statistics over 2 vs 4
    samples are semantically different. Unlocks b192+ at 512²
    (round-3 VERDICT next #7; scripts/exp_r6c.py)."""
    import optax

    from wsiseg_tpu import losses

    jax.config.update("jax_enable_x64", True)
    try:
        tile = 32
        f64 = jnp.float64
        cfg = default_config(tile_w=tile, tile_h=tile,
                             compute_dtype="float64", norm_dtype="float64",
                             optim="sgd", lr=1e-2, train_s2d_tail=False,
                             grad_accum=2)  # wired via config (--grad_accum)
        model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(f64) if x.dtype == jnp.float32 else x,
            variables)
        tx = optax.sgd(1e-2)
        rng = np.random.RandomState(3)
        b = 4
        batch = {
            "image": rng.randn(b, tile, tile, 3).astype(np.float64),
            "seg_label": rng.randint(0, cfg.num_classes,
                                     (b, tile, tile)).astype(np.int32),
            "cls_label": np.array([1, -1, 2, -1], np.int32),
            "reg_label": np.array([0.0, 0.7, 0.0, 0.2], np.float64),
            "is_cls": np.array([1.0, 0.0, 1.0, 0.0], np.float64),
            "is_reg": np.array([0.0, 1.0, 0.0, 1.0], np.float64),
            "is_seg": np.array([0.0, 1.0, 0.0, 1.0], np.float64),
        }

        state = TrainState.create(variables, tx)
        step_ga = jax.jit(make_hybrid_train_step(model, tx, cfg))
        key = jax.random.PRNGKey(5)
        s_ga, m_ga = step_ga(state, batch, key)

        # manual reference: microbatch grads with the same folds, averaged
        def loss_fn(params, stats, mb, k):
            out, mut = model.apply({"params": params, "batch_stats": stats},
                                   mb["image"], train=True,
                                   mutable=["batch_stats"],
                                   rngs={"dropout": k})
            l = (losses.cross_entropy(out["cls"], mb["cls_label"],
                                      ignore_index=-1,
                                      sample_weight=mb["is_cls"])
                 + losses.mse(out["reg"][:, 0], mb["reg_label"],
                              sample_weight=mb["is_reg"])
                 + losses.cross_entropy(out["seg"], mb["seg_label"],
                                        sample_weight=mb["is_seg"]))
            return l, mut["batch_stats"]

        mbs = [{k2: v[:2] for k2, v in batch.items()},
               {k2: v[2:] for k2, v in batch.items()}]
        stats = state.batch_stats
        gsum = None
        ltot = 0.0
        for k, mb in enumerate(mbs):
            (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, stats, mb, jax.random.fold_in(key, k))
            ltot += float(l)
            gsum = g if gsum is None else jax.tree_util.tree_map(
                jnp.add, gsum, g)
        grads = jax.tree_util.tree_map(lambda x: x / 2, gsum)
        updates, _ = tx.update(grads, state.opt_state, state.params)
        params_ref = optax.apply_updates(state.params, updates)

        # a few loss sub-reductions stay f32 (flax forces f32 BN stats)
        # → loss agrees to ~1e-7 rel, not full f64
        np.testing.assert_allclose(float(m_ga["loss"]), ltot / 2,
                                   rtol=1e-6)
        # lr 1e-2 × the measured 1.2e-6 f64 grad envelope → 1e-6 headroom
        d = jax.tree_util.tree_map(
            lambda a, b2: float(jnp.abs(a - b2).max()),
            s_ga.params, params_ref)
        assert max(jax.tree_util.tree_leaves(d)) < 1e-6
        ds = jax.tree_util.tree_map(
            lambda a, b2: float(jnp.abs(a - b2).max()),
            s_ga.batch_stats, stats)
        assert max(jax.tree_util.tree_leaves(ds)) < 1e-9
    finally:
        jax.config.update("jax_enable_x64", False)


def test_host_step_keys_deterministic_distinct():
    """Host-derived per-step rng keys: deterministic per (seed, epoch,
    step), distinct across steps/epochs/lanes, raw uint32[2] key data."""
    from wsiseg_tpu.train.loop import host_step_keys
    a1, p1 = host_step_keys(7, 2, 5)
    a2, p2 = host_step_keys(7, 2, 5)
    assert (a1 == a2).all() and (p1 == p2).all()
    assert a1.dtype == np.uint32 and a1.shape == (2,)
    assert tuple(a1) != tuple(p1)
    seen = {tuple(host_step_keys(7, e, s)[0])
            for e in range(4) for s in range(50)}
    assert len(seen) == 200
    # a raw key drives jax.random directly
    import jax
    assert float(jax.random.uniform(jnp.asarray(a1), ())) != float(
        jax.random.uniform(jnp.asarray(p1), ()))
