"""Device-resident epoch cache (round-4 VERDICT next #2): upload the u8
training set once, gather/normalize inside the jitted step — grads and
updates must match the host-fed path bit-for-bit under the same rng
splits (train/device_cache.py). TPU counterpart of the reference's
worker-pool DataLoader (utils/dataset.py:72-78)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsiseg_tpu.config import default_config
from wsiseg_tpu.data.patches import add_s2d_seg_labels, normalize_batch_images
from wsiseg_tpu.models.ynet import init_ynet
from wsiseg_tpu.optim import build_optimizer
from wsiseg_tpu.train.device_cache import (DeviceEpochCache, gather_batch,
                                           make_cached_hybrid_train_step)
from wsiseg_tpu.train.state import TrainState
from wsiseg_tpu.train.steps import make_hybrid_train_step

TILE = 32
B = 4


def _host_batches(n_batches, b=B, hw=TILE, ncls=4, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_batches):
        out.append({
            "image": rng.randint(0, 255, (b, hw, hw, 3)).astype(np.uint8),
            "seg_label": rng.randint(0, ncls, (b, hw, hw)).astype(np.int32),
            "cls_label": rng.randint(-1, ncls, (b,)).astype(np.int32),
            "reg_label": rng.rand(b).astype(np.float32),
            "is_cls": (rng.rand(b) < 0.5).astype(np.float32),
            "is_reg": (rng.rand(b) < 0.3).astype(np.float32),
            "is_seg": (rng.rand(b) < 0.5).astype(np.float32),
        })
    return out


@pytest.fixture(scope="module")
def setup():
    # sgd: exactness comparisons never go through adam's rsqrt (CLAUDE.md)
    cfg = default_config(tile_w=TILE, tile_h=TILE, batch_size=B,
                         compute_dtype="float32", optim="sgd", lr=1e-2)
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(cfg)
    batches = _host_batches(3)
    cache = DeviceEpochCache.build(iter(batches), cfg)
    return cfg, model, variables, tx, batches, cache


def test_build_shapes_and_dtypes(setup):
    cfg, model, variables, tx, batches, cache = setup
    assert cache.n == 3 * B
    assert cache.arrays["image"].dtype == jnp.uint8
    assert cache.arrays["seg_label"].dtype == jnp.uint8
    # s2d label view precomputed at build (Unet tail, dims % 8 == 0)
    assert "seg_label_s2d" in cache.arrays
    assert cache.arrays["seg_label_s2d"].shape == (12, TILE // 4, TILE // 4, 16)


def test_cached_step_matches_host_fed_f64():
    """Same rows, same rng splits → same loss and sgd update. Run in f64
    (the repo's documented oracle pattern, test_train_e2e.py): at f32 the
    two graphs' conv reduction orders differ (normalize fused into the
    step vs the production separate preprocess jit) and an untrained
    full-depth net amplifies that chaotically — loss agrees to ~1e-6 rel
    but isolated param leaves drift to ~1e-4. f64 collapses the
    reduction-order noise to ~1e-9 and the comparison is tight."""
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = default_config(tile_w=TILE, tile_h=TILE, batch_size=B,
                             compute_dtype="float64", norm_dtype="float64",
                             optim="sgd", lr=1e-2)
        model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64) if x.dtype == jnp.float32 else x,
            variables)
        tx = build_optimizer(cfg)
        batches = _host_batches(3)
        cache = DeviceEpochCache.build(iter(batches), cfg)

        state_a = TrainState.create(variables, tx)
        state_b = TrainState.create(variables, tx)
        base = jax.jit(make_hybrid_train_step(model, tx, cfg))
        cached = jax.jit(make_cached_hybrid_train_step(model, tx, cfg))

        rng = jax.random.PRNGKey(7)
        idx = np.array([9, 2, 4, 11], np.int32)

        # host-fed path: gather the same rows host-side, preprocess with
        # the SAME pp key the cached step derives internally
        host = {k: np.concatenate([b[k] for b in batches])
                for k in batches[0]}
        hb = {k: v[idx] for k, v in host.items()}
        hb = add_s2d_seg_labels(hb, cfg)
        sub, pp = jax.random.split(rng)
        hb["image"] = normalize_batch_images(jnp.asarray(hb["image"]), cfg,
                                             rng=pp, train=True)
        state_a, ma = base(state_a,
                           {k: jnp.asarray(v) for k, v in hb.items()}, sub)
        state_b, mb = cached(state_b, cache.arrays, jnp.asarray(idx), rng)

        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=1e-6)
        init = jax.tree_util.tree_leaves(variables["params"])
        la = jax.tree_util.tree_leaves(state_a.params)
        lb = jax.tree_util.tree_leaves(state_b.params)
        for p0, a, b in zip(init, la, lb):
            da = np.asarray(a) - np.asarray(p0)
            db = np.asarray(b) - np.asarray(p0)
            # the normalize is f32 by contract (astype in
            # normalize_batch_images), so the two jit contexts can differ
            # by f32 input ulps even under the f64 oracle — measured max
            # 1.1e-7 on one head-weight element; everything else ≤1e-7
            np.testing.assert_allclose(da, db, atol=3e-7,
                                       err_msg=f"shape {p0.shape}")
    finally:
        jax.config.update("jax_enable_x64", False)


def test_gather_batch_contract(setup):
    """gather_batch reproduces the host batch contract (normalized f32
    image, i32 labels) for eval-mode (no jitter) gathers."""
    cfg, model, variables, tx, batches, cache = setup
    idx = jnp.arange(B, dtype=jnp.int32)
    b = jax.jit(lambda a, i: gather_batch(a, i, cfg, rng=None, train=False)
                )(cache.arrays, idx)
    assert b["image"].dtype == jnp.float32
    assert b["seg_label"].dtype == jnp.int32
    ref = normalize_batch_images(jnp.asarray(batches[0]["image"]), cfg,
                                 rng=None, train=False)
    np.testing.assert_allclose(np.asarray(b["image"]), np.asarray(ref),
                               atol=1e-6)


def test_index_batches_is_epoch_permutation(setup):
    cfg, model, variables, tx, batches, cache = setup
    seen = np.concatenate(list(cache.index_batches(B, seed=3, epoch=1)))
    assert sorted(seen.tolist()) == list(range(cache.n))
    # different epoch → different order, same coverage
    seen2 = np.concatenate(list(cache.index_batches(B, seed=3, epoch=2)))
    assert sorted(seen2.tolist()) == list(range(cache.n))
    assert (seen != seen2).any()
    # drop_remainder drops the short tail
    tail = list(cache.index_batches(5, seed=0, epoch=0))
    assert all(len(ix) == 5 for ix in tail)


def test_max_bytes_cap(setup):
    cfg, model, variables, tx, batches, cache = setup
    one = batches[0]["image"].nbytes
    small = DeviceEpochCache.build(iter(batches), cfg, max_bytes=one + 1)
    assert small.n == B  # second batch would exceed the cap
    # cap below even the first batch: clean error, not a KeyError
    with pytest.raises(ValueError, match="no batches"):
        DeviceEpochCache.build(iter(batches), cfg, max_bytes=one - 1)


def test_cached_trainer_learns(setup):
    """The cli/train.py --device_cache wiring end-to-end: Trainer fed
    {"idx"} batches + a step closed over the cache arrays learns a
    brightness→class rule (loss decreases over epochs)."""
    from wsiseg_tpu.train.loop import Trainer

    cfg = default_config(tile_w=TILE, tile_h=TILE, batch_size=4,
                         compute_dtype="float32", lr=3e-4,
                         device_cache=True)
    rng = np.random.RandomState(5)
    rows = []
    for i in range(16):
        c = i % 3 + 1
        img = rng.randint(0, 60, (TILE, TILE, 3)).astype(np.uint8)
        img[..., c - 1] += 180
        rows.append((img, c))
    batch = {
        "image": np.stack([r[0] for r in rows]),
        "seg_label": np.zeros((16, TILE, TILE), np.int32),
        "cls_label": np.array([r[1] for r in rows], np.int32),
        "reg_label": np.zeros(16, np.float32),
        "is_cls": np.ones(16, np.float32),
        "is_reg": np.zeros(16, np.float32),
        "is_seg": np.zeros(16, np.float32),
    }
    model, variables = init_ynet(cfg, jax.random.PRNGKey(1))
    tx = build_optimizer(cfg)
    state = TrainState.create(variables, tx)
    cache = DeviceEpochCache.build(iter([batch]), cfg)
    cstep = jax.jit(make_cached_hybrid_train_step(model, tx, cfg),
                    donate_argnums=0)
    step = lambda st, b, rng: cstep(st, cache.arrays, b["idx"], rng)  # noqa: E731
    ep_counter = iter(range(100))

    def make_batches():
        ep = next(ep_counter)
        return ({"idx": ix} for ix in cache.index_batches(
            cfg.batch_size, seed=cfg.seed, epoch=ep))

    trainer = Trainer(cfg, state, step, make_batches=make_batches,
                      preprocess_batch=None, log_fn=lambda s: None)
    trainer.run(start_epoch=1, num_epochs=8)
    first, last = trainer.history[0]["loss"], trainer.history[-1]["loss"]
    assert last < first, f"loss did not decrease: {first} -> {last}"
    # idx batches counted as samples (the loop's leading-axis fallback)
    assert trainer.history[0]["patches_per_sec"] > 0


def test_rejects_float_images(setup):
    cfg = setup[0]
    bad = _host_batches(1)
    bad[0]["image"] = bad[0]["image"].astype(np.float32)
    with pytest.raises(ValueError, match="uint8"):
        DeviceEpochCache.build(iter(bad), cfg)
