"""Train-mode s2d decoder tail (unet.UNetDecoder(s2d_tail=True)) is an
EXACT, differentiable re-execution of the native decoder: same param/stat
trees, same outputs, same running-stat updates, same gradients.

Reference twin: smp Unet decoder training (train.py:29); the s2d tail is
the TPU-native execution of the same math (models/unet.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsiseg_tpu.models.unet import UNetDecoder


def _feats(rng, b=2, hw=64, dtype=jnp.float32):
    """Deepest-first resnet18-shaped pyramid for an hw² input."""
    shapes = [(b, hw // 32, hw // 32, 512), (b, hw // 16, hw // 16, 256),
              (b, hw // 8, hw // 8, 128), (b, hw // 4, hw // 4, 64),
              (b, hw // 2, hw // 2, 64)]
    keys = jax.random.split(rng, len(shapes))
    return [jax.random.normal(k, s, dtype) for k, s in zip(keys, shapes)]


@pytest.fixture(scope="module")
def setup():
    dec = UNetDecoder(num_classes=4, dtype=jnp.float32,
                      norm_dtype=jnp.float32)
    dec_s2d = UNetDecoder(num_classes=4, dtype=jnp.float32,
                          norm_dtype=jnp.float32, s2d_tail=True)
    feats = _feats(jax.random.PRNGKey(0))
    variables = dec.init(jax.random.PRNGKey(1), feats, train=False)
    return dec, dec_s2d, feats, variables


def test_param_tree_identical(setup):
    dec, dec_s2d, feats, variables = setup
    v2 = dec_s2d.init(jax.random.PRNGKey(1), feats, train=True)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(v2)):
        assert p1 == p2 and a.shape == b.shape


def test_train_forward_and_stats_exact(setup):
    dec, dec_s2d, feats, variables = setup

    y_ref, mut_ref = jax.jit(
        lambda v: dec.apply(v, feats, train=True,
                            mutable=["batch_stats"]))(variables)
    y_s2d, mut_s2d = jax.jit(
        lambda v: dec_s2d.apply(v, feats, train=True,
                                mutable=["batch_stats"]))(variables)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_ref),
                               rtol=0, atol=2e-4)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(mut_ref),
            jax.tree_util.tree_leaves_with_path(mut_s2d)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-5, err_msg=str(pa))


def test_train_gradients_exact(setup):
    dec, dec_s2d, feats, variables = setup
    tgt = jax.random.normal(jax.random.PRNGKey(3),
                            (2, 64, 64, 4), jnp.float32)

    def loss(m):
        def f(params):
            y, _ = m.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                feats, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(y - tgt))
        return f

    g_ref = jax.jit(jax.grad(loss(dec)))(variables["params"])
    g_s2d = jax.jit(jax.grad(loss(dec_s2d)))(variables["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_s2d)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=5e-5, err_msg=str(pa))


def test_eval_mode_uses_native_path(setup):
    """train=False must run the canonical decoder (engine fast paths handle
    inference); outputs equal either way by construction."""
    dec, dec_s2d, feats, variables = setup
    y1 = jax.jit(lambda v: dec.apply(v, feats, train=False))(variables)
    y2 = jax.jit(lambda v: dec_s2d.apply(v, feats, train=False))(variables)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=0, atol=0)


def test_nonstandard_channels_fall_back_native():
    """decoder_channels != 5 entries → native path, still trains."""
    dec_s2d = UNetDecoder(num_classes=4, decoder_channels=(64, 32, 16),
                          dtype=jnp.float32, norm_dtype=jnp.float32,
                          s2d_tail=True)
    feats = _feats(jax.random.PRNGKey(5), b=1, hw=64)
    v = dec_s2d.init(jax.random.PRNGKey(0), feats, train=True)
    y, _ = dec_s2d.apply(v, feats, train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()


def test_cross_entropy_s2d_matches_full_res():
    """losses.cross_entropy_s2d == cross_entropy(depth_to_space(logits), t)
    for every option combination (the layouts enumerate the same pixels)."""
    from wsiseg_tpu import losses
    from wsiseg_tpu.data.patches import seg_labels_s2d
    from wsiseg_tpu.models.fast_decoder import depth_to_space

    rng = np.random.RandomState(0)
    b, h, w, c, f = 3, 16, 24, 4, 4
    x = jnp.asarray(rng.randn(b, h // f, w // f, f * f * c)
                    .astype(np.float32))
    lab = rng.randint(-1, c, (b, h, w)).astype(np.int32)   # incl. ignore
    lab_s2d = jnp.asarray(seg_labels_s2d(lab, f))
    lab = jnp.asarray(lab)
    full = depth_to_space(x, f)
    cw = jnp.asarray([1.0, 2.0, 0.5, 1.5])
    sw = jnp.asarray([1.0, 0.0, 0.5])
    for kw in ({}, {"class_weights": cw}, {"sample_weight": sw},
               {"class_weights": cw, "sample_weight": sw},
               {"ignore_index": 2}):
        a = losses.cross_entropy(full, lab, **kw)
        bb = losses.cross_entropy_s2d(x, lab_s2d, f, **kw)
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=1e-6, err_msg=str(kw))
        ga = jax.grad(lambda z: losses.cross_entropy(
            depth_to_space(z, f), lab, **kw))(x)
        gb = jax.grad(lambda z: losses.cross_entropy_s2d(
            z, lab_s2d, f, **kw))(x)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=0, atol=1e-7, err_msg=str(kw))


def test_hybrid_step_s2d_loss_exact():
    """Full hybrid train step: the s2d-loss path (s2d logits + host s2d
    labels) produces the same loss and updated params as the native path,
    at f32. Also covers the d2s fallback when the batch lacks the s2d
    labels."""
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.data.patches import add_s2d_seg_labels
    from wsiseg_tpu.models.ynet import init_ynet
    from wsiseg_tpu.optim import build_optimizer
    from wsiseg_tpu.train.state import TrainState
    from wsiseg_tpu.train.steps import make_hybrid_train_step

    b, t = 2, 64
    rs = np.random.RandomState(0)
    batch = {
        "image": rs.rand(b, t, t, 3).astype(np.float32),
        "cls_label": rs.randint(0, 4, (b,)).astype(np.int32),
        "reg_label": rs.rand(b).astype(np.float32),
        "seg_label": rs.randint(0, 4, (b, t, t)).astype(np.int32),
        "is_cls": np.ones((b,), np.float32),
        "is_reg": np.ones((b,), np.float32),
        "is_seg": np.ones((b,), np.float32),
    }
    results = {}
    for name, s2d_loss, with_labels in (("native", False, False),
                                        ("s2d", True, True),
                                        ("s2d_fallback", True, False)):
        # sgd: the param delta is LINEAR in the grad, so the comparison
        # tolerances track the grads themselves (adam's rsqrt amplifies
        # benign f32 reduction-order noise unboundedly near v ≈ 0)
        cfg = default_config(tile_w=t, tile_h=t, compute_dtype="float32",
                             optim="sgd", lr=0.1,
                             train_s2d_tail=True, train_s2d_loss=s2d_loss)
        model, variables = init_ynet(cfg, jax.random.PRNGKey(0))
        tx = build_optimizer(cfg)
        step = jax.jit(make_hybrid_train_step(model, tx, cfg))
        bb = add_s2d_seg_labels(batch, cfg) if with_labels else dict(batch)
        if with_labels:
            assert "seg_label_s2d" in bb
        state = TrainState.create(jax.tree_util.tree_map(jnp.copy, variables),
                                  tx)
        state, met = step(state, bb, jax.random.PRNGKey(1))
        results[name] = (float(met["loss_seg"]), state.params)
    for variant in ("s2d", "s2d_fallback"):
        np.testing.assert_allclose(results[variant][0], results["native"][0],
                                   rtol=1e-6, err_msg=variant)
        # atol: the s2d path sums the identical pixel population in a
        # different order — ~1e-7-relative f32 reduction noise in the
        # grads, linear through the sgd update
        for (pa, a), (pb, bv) in zip(
                jax.tree_util.tree_leaves_with_path(results["native"][1]),
                jax.tree_util.tree_leaves_with_path(results[variant][1])):
            assert pa == pb
            np.testing.assert_allclose(np.asarray(bv), np.asarray(a),
                                       rtol=0, atol=1e-6,
                                       err_msg=f"{variant}:{pa}")
