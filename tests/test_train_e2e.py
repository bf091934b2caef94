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
