"""Train-mode s2d decoder tail for Linknet
(decoders.LinknetDecoder(s2d_tail=True)) is an EXACT, differentiable
re-execution of the native decoder: same param/stat trees, same outputs,
same running-stat updates, same gradients.

Reference twin: smp Linknet training (train.py:29 with the myargs.py:9-10
model_name selection); the s2d tail is the TPU-native execution of the
same math (see unet.py / decoders.py docstrings).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wsiseg_tpu.models.decoders import LinknetDecoder


def _feats(rng, b=2, hw=64, dtype=jnp.float32):
    """Deepest-first resnet18-shaped pyramid for an hw² input."""
    shapes = [(b, hw // 32, hw // 32, 512), (b, hw // 16, hw // 16, 256),
              (b, hw // 8, hw // 8, 128), (b, hw // 4, hw // 4, 64),
              (b, hw // 2, hw // 2, 64)]
    keys = jax.random.split(rng, len(shapes))
    return [jax.random.normal(k, s, dtype) for k, s in zip(keys, shapes)]


@pytest.fixture(scope="module")
def setup():
    dec = LinknetDecoder(num_classes=4, dtype=jnp.float32,
                         norm_dtype=jnp.float32)
    dec_s2d = LinknetDecoder(num_classes=4, dtype=jnp.float32,
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


def test_s2d_logits_layout(setup):
    """s2d_logits=True emits (B, H/4, W/4, 16·nc) whose depth_to_space is
    the native-layout output bit-for-bit."""
    from wsiseg_tpu.models.fast_decoder import depth_to_space

    dec, dec_s2d, feats, variables = setup
    dec_l = LinknetDecoder(num_classes=4, dtype=jnp.float32,
                           norm_dtype=jnp.float32, s2d_tail=True,
                           s2d_logits=True)
    y_s2d = jax.jit(
        lambda v: dec_s2d.apply(v, feats, train=True,
                                mutable=["batch_stats"])[0])(variables)
    y_l = jax.jit(
        lambda v: dec_l.apply(v, feats, train=True,
                              mutable=["batch_stats"])[0])(variables)
    assert y_l.shape == (2, 16, 16, 64)
    np.testing.assert_array_equal(np.asarray(depth_to_space(y_l, 4)),
                                  np.asarray(y_s2d))


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
    # Tolerances = the f32 CONDITIONING envelope, not exactness: the tail's
    # math is proven exact in f64 (composed blocks3-4+head vs native chain:
    # fwd max|Δ| 1.3e-14, grads ≤ 6.3e-9 — pure f64 reassociation). In f32
    # the two layouts associate the cancellative backward reductions
    # differently (conv-shaped cotangents oscillate; bias/mean sums cancel),
    # so isolated elements drift up to ~3e-4 abs / ~1% leaf-RMS — the same
    # phenomenon as the sharded-vs-single grad envelope (see CLAUDE.md).
    # A structural bug (wrong route/transform) moves MANY elements by
    # O(grad) and fails both bounds by orders of magnitude.
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_s2d)):
        assert pa == pb
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rms = float(np.sqrt(np.mean(np.square(a - b))))
        rms_ref = float(np.sqrt(np.mean(np.square(a))))
        assert rms <= 5e-5 + 2e-2 * rms_ref, (pa, rms, rms_ref)
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-3, err_msg=str(pa))


def test_eval_mode_uses_native_path(setup):
    """train=False must run the canonical decoder (engine fast paths handle
    inference); outputs equal either way by construction."""
    dec, dec_s2d, feats, variables = setup
    y1 = jax.jit(lambda v: dec.apply(v, feats, train=False))(variables)
    y2 = jax.jit(lambda v: dec_s2d.apply(v, feats, train=False))(variables)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=0, atol=0)


def test_ynet_linknet_s2d_tags_output():
    """YNet(model_name=Linknet, train_s2d_tail) tags train outputs with
    seg_s2d=4 so the hybrid step pairs them with cross_entropy_s2d."""
    from wsiseg_tpu.config import default_config
    from wsiseg_tpu.models.ynet import init_ynet

    cfg = default_config(tile_w=32, tile_h=32, compute_dtype="float32",
                         model_name="Linknet")
    assert cfg.train_s2d_tail
    model, variables = init_ynet(cfg, jax.random.PRNGKey(0),
                                 tile_hw=(32, 32))
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    out, _ = model.apply(variables, x, train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.get("seg_s2d") == 4
    assert out["seg"].shape == (2, 8, 8, 64)

    # host-side label wiring follows: Linknet batches get seg_label_s2d
    # (dims % 4 — c1 at H/2 must have even dims; Unet needs % 8)
    from wsiseg_tpu.data.patches import add_s2d_seg_labels
    batch = {"seg_label": np.zeros((2, 32, 32), np.int32)}
    assert "seg_label_s2d" in add_s2d_seg_labels(batch, cfg)
    odd = {"seg_label": np.zeros((2, 30, 32), np.int32)}
    assert "seg_label_s2d" not in add_s2d_seg_labels(odd, cfg)
